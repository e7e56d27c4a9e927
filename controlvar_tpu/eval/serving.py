"""Serving-oriented dispatch utilities.

A scalar readback through a remote-tunnel TPU runtime stalls ~50 ms
regardless of the work being read (measured, PERF.md §2), and host-side
postprocessing (PNG encoding, metrics) serializes with device execution in
a naive generate→save loop. `pipelined_map` keeps up to `depth` batches in
flight: while the host blocks on / postprocesses batch i, batches
i+1..i+depth are already dispatched and executing. This is the same
pattern the reference's eager loop cannot express (each torch step syncs
implicitly) and what bench.py's steady-state timing measures.

Memory: each in-flight batch holds its own device buffers (for the d16
conditional sampler a batch keeps ~6 GB of KV cache while queued, and 4
B=16 batches fit a 16 GB v5e — measured), so `depth` bounds peak device
memory. depth=2 captures most of the win: the readback stall and host IO
hide behind the next batch's execution.
"""
from __future__ import annotations

from collections import deque
from typing import Callable, Iterable, Iterator, Tuple, TypeVar

T = TypeVar("T")
R = TypeVar("R")


def pipelined_map(
    fn: Callable[[T], R],
    items: Iterable[T],
    depth: int = 2,
) -> Iterator[Tuple[T, R]]:
    """Lazily map an async device computation over `items` with up to
    `depth` calls in flight; yields (item, result) in submission order.

    `fn` must return JAX arrays (any pytree): dispatch is asynchronous, so
    calling it does not block; the consumer's first use of the result (e.g.
    `np.asarray`) performs the real transfer. `block_until_ready` is called
    on the yielded result as a scheduling hint. `items` is consumed lazily —
    at most `depth` items are in flight (dispatched, un-yielded) at once,
    so `depth` bounds peak device memory as documented."""
    import jax

    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    q: deque = deque()
    for item in items:
        if len(q) >= depth:
            it0, out0 = q.popleft()
            yield it0, jax.block_until_ready(out0)
        q.append((item, fn(item)))
    while q:
        it0, out0 = q.popleft()
        yield it0, jax.block_until_ready(out0)
