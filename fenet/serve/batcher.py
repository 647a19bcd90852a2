"""Micro-batching scheduler: many concurrent requests -> one padded batch.

The TPU's serving sweet spot is large statically-shaped batches (the MXU
is a 128x128 systolic array; at batch 1 the deploy forward is
launch/latency-bound). The scheduler amortizes that: requests enqueue a
(image, Future) pair, a single dispatcher thread drains up to
``max_batch`` of them every ``window_ms`` (sooner when a full batch is
already waiting), pads to the fixed batch size, runs ONE jitted forward,
and distributes the rows back through the futures.

A single dispatcher thread is deliberate: one in-flight program per
device keeps execution in submission order with no cross-request
interference, and the hand-off queue is the only lock. The forward
itself is whatever callable the caller provides (the HTTP server passes
the dp-sharded deploy forward), so the scheduler is model- and
backend-agnostic and unit-testable without a TPU.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Callable, Sequence

import numpy as np


class MicroBatcher:
    """Batch single-image requests into fixed-size forward calls.

    ``forward``: callable taking a (max_batch, H, W, C) uint8 array and
    returning an array-like (max_batch, num_points, 3) — row i of the
    output must correspond to row i of the input. It may return an
    in-flight device array (jax async dispatch): the fetch happens at
    resolve time, which is what the depth-1 pipeline overlaps.
    """

    def __init__(self, forward: Callable[[np.ndarray], np.ndarray],
                 max_batch: int = 32, window_ms: float = 5.0):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self._forward = forward
        self._max_batch = max_batch
        self._window_s = window_ms / 1e3
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = threading.Event()
        self._submit_lock = threading.Lock()  # makes submit/close atomic
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- client side ------------------------------------------------------
    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one (H, W, C) uint8 image; resolves to (num_points, 3)
        float32. Raises after close()."""
        fut: Future = Future()
        with self._submit_lock:
            if self._closed.is_set():
                raise RuntimeError("MicroBatcher is closed")
            self._queue.put((np.asarray(image), fut))
        return fut

    def predict(self, image: np.ndarray) -> np.ndarray:
        return self.submit(image).result()

    def close(self, timeout: float = 10.0):
        """Stop the dispatcher; queued requests still drain first."""
        with self._submit_lock:  # no submit can slip in past the sentinel
            self._closed.set()
            self._queue.put(None)  # wake the blocking get
        self._thread.join(timeout)

    # -- dispatcher -------------------------------------------------------
    def _collect(self, block: bool) -> Sequence:
        """Gather up to max_batch requests within the window (returning
        early when the batch fills). ``block=True`` waits for the first
        request; ``block=False`` (a dispatched batch is still in flight)
        returns [] immediately when the queue is idle so the caller can
        resolve it."""
        import time

        try:
            if not block:
                # A batch is in flight: an idle queue means "resolve it
                # now" — zero added latency for its waiters.
                first = self._queue.get_nowait()
            elif self._closed.is_set():
                # Closed: bounded wait so the drain loop can observe
                # emptiness (the wake sentinel is consumed on first
                # receipt).
                first = self._queue.get(timeout=0.05)
            else:
                first = self._queue.get()
        except queue.Empty:
            return []
        if first is None:
            return []
        batch = [first]
        deadline = time.time() + self._window_s
        while len(batch) < self._max_batch:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                break
            batch.append(item)
        return batch

    def _resolve(self, batch, out):
        """Fetch a dispatched batch's result (blocks until the device
        drains — with jax's async dispatch this np.asarray is where the
        wait actually happens) and fan rows out to the waiters."""
        try:
            clouds = np.asarray(out, np.float32)
        except Exception as e:  # device-side failure surfaces at fetch
            for _, fut in batch:
                fut.set_exception(e)
            return
        for row, (_, fut) in enumerate(batch):
            fut.set_result(clouds[row])

    def _loop(self):
        # One-deep software pipeline (the eval runner's design,
        # eval/runner.py): batch i's result is fetched only after batch
        # i+1 is dispatched, so i+1's host work + host->device transfer
        # overlap i's device compute — on transfer-bound links serving
        # throughput otherwise serializes the two. A lone request is
        # resolved immediately (the queue goes idle), so p50 latency at
        # low rates is unchanged.
        pending = None  # (batch, in-flight result)
        while True:
            batch = self._collect(block=pending is None)
            if not batch:
                if pending is not None:
                    self._resolve(*pending)
                    pending = None
                    continue
                if self._closed.is_set() and self._queue.empty():
                    return
                continue
            try:
                # Assembly is inside the try too: a shape-mismatched
                # submission (mixed image sizes in one batch) must fail
                # THAT batch, not kill the dispatcher thread.
                images = np.stack([img for img, _ in batch])
                n = images.shape[0]
                if n < self._max_batch:  # static shapes: pad to the program
                    pad = self._max_batch - n
                    images = np.concatenate(
                        [images, images[-1:].repeat(pad, 0)]
                    )
                out = self._forward(images)  # async dispatch, no fetch yet
            except Exception as e:  # propagate to every waiter, keep serving
                for _, fut in batch:
                    fut.set_exception(e)
                if pending is not None:  # don't strand a completed batch
                    self._resolve(*pending)
                    pending = None
                continue
            if pending is not None:
                self._resolve(*pending)
            pending = (batch, out)
