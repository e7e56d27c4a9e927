"""Experiment tracking: wandb when available, JSONL fallback otherwise
(the reference hard-depends on wandb, reference: utils/wandb.py:7-26)."""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class Tracker:
    def __init__(self, project: str, name: Optional[str] = None,
                 config: Optional[Dict] = None, out_dir: str = "."):
        self._wandb = None
        try:
            import wandb  # type: ignore

            self._wandb = wandb
            wandb.init(project=project, name=name, config=config or {})
        except Exception:
            os.makedirs(out_dir, exist_ok=True)
            self._file = open(
                os.path.join(out_dir, f"metrics_{name or project}.jsonl"), "a"
            )

    def log(self, metrics: Dict, step: Optional[int] = None) -> None:
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
            return
        rec = {"t": time.time(), **({"step": step} if step is not None else {}),
               **{k: float(v) if hasattr(v, "__float__") else v for k, v in metrics.items()}}
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()

    def log_images(self, tag: str, images, step: Optional[int] = None,
                   out_dir: str = "./media") -> None:
        """Images (N, H, W, 3) float [0,1]: wandb or PNG files."""
        import numpy as np

        if self._wandb is not None:
            self._wandb.log({tag: [self._wandb.Image(np.asarray(i)) for i in images]},
                            step=step)
            return
        from PIL import Image

        os.makedirs(out_dir, exist_ok=True)
        for i, img in enumerate(images):
            arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(out_dir, f"{tag}_{step or 0}_{i}.png")
            )

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
        elif hasattr(self, "_file"):
            self._file.close()


class StepProfiler:
    """jax.profiler wrapper: capture a trace for steps [start, start+count)."""

    def __init__(self, log_dir: str, start_step: int = 10, num_steps: int = 3):
        self.log_dir = log_dir
        self.start_step = start_step
        self.end_step = start_step + num_steps
        self._active = False

    def step(self, step: int) -> None:
        import jax

        if step == self.start_step and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step == self.end_step and self._active:
            jax.profiler.stop_trace()
            self._active = False
