"""pipelined_map: ordering, laziness, equivalence with a sequential loop."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlvar_tpu.eval.serving import pipelined_map


def test_results_in_submission_order_and_equal_sequential():
    f = jax.jit(lambda x: x * 2 + 1)
    items = [jnp.full((4,), i, jnp.float32) for i in range(7)]
    got = list(pipelined_map(f, items, depth=3))
    assert len(got) == 7
    for i, (item, out) in enumerate(got):
        np.testing.assert_array_equal(np.asarray(item), np.full((4,), i))
        np.testing.assert_array_equal(np.asarray(out), np.full((4,), 2 * i + 1))


def test_pytree_results_and_depth_one():
    f = lambda x: (x + 1, {"sq": x * x})
    items = [jnp.asarray(float(i)) for i in range(4)]
    outs = [o for _, o in pipelined_map(f, items, depth=1)]
    assert float(outs[2][0]) == 3.0
    assert float(outs[3][1]["sq"]) == 9.0


def test_items_consumed_lazily():
    """At most `depth` items are in flight: dispatch of item depth+i waits
    until item i was yielded (the documented device-memory bound)."""
    drawn = []

    def items():
        for i in range(10):
            drawn.append(i)
            yield jnp.asarray(float(i))

    gen = pipelined_map(lambda x: x + 1, items(), depth=2)
    next(gen)  # first yield happens once the window is full
    assert len(drawn) <= 3  # 2 in flight + the one being appended
    list(gen)
    assert len(drawn) == 10


def test_in_flight_never_exceeds_depth():
    """dispatched-but-unyielded results never exceed `depth`."""
    for depth in (1, 2, 3):
        dispatched, yielded, peak = [0], [0], [0]

        def fn(x):
            dispatched[0] += 1
            peak[0] = max(peak[0], dispatched[0] - yielded[0])
            return jnp.asarray(float(x))

        for _ in pipelined_map(fn, list(range(8)), depth=depth):
            yielded[0] += 1
        assert yielded[0] == 8
        assert peak[0] <= depth


def test_depth_validation():
    with pytest.raises(ValueError):
        list(pipelined_map(lambda x: x, [jnp.zeros(())], depth=0))
