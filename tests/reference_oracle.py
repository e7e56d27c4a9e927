"""Import helpers for using the read-only reference implementation
(/root/reference, PyTorch) as a numerical test oracle on CPU.

We never copy reference code; we import it and compare outputs.
"""
import sys

REFERENCE_ROOT = "/root/reference"


def import_reference_quant():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import models.quant as ref_quant  # type: ignore

    return ref_quant


def torch_conv_to_hwio(w_oihw):
    """torch Conv2d weight (O, I, kH, kW) -> JAX HWIO (kH, kW, I, O)."""
    return w_oihw.detach().numpy().transpose(2, 3, 1, 0)
