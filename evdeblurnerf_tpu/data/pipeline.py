"""Host->device input pipeline: endless samplers + threaded double-buffered
prefetch.

TPU-native replacement for the reference's DataLoader worker-process +
pin_memory + ``.cuda(non_blocking=True)`` pipeline (ref: run_nerf.py:86-108,
433-435): batch assembly is a vectorized numpy gather, so a single
background thread assembling the *joint* (image rays + event rays) batch and
``jax.device_put``-ing it ahead of time keeps the accelerator fed; the train
step then consumes device-resident arrays with zero host sync.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


def endless(sampler_factory: Callable[[], Iterator]):
    """Loop a (re-created) epoch sampler forever (ref: data/loader.py:16-22).

    ``sampler_factory``: zero-arg callable returning a fresh epoch iterator.
    """
    while True:
        it = sampler_factory()
        if it is None:
            yield None
            continue
        produced = False
        for x in it:
            produced = True
            yield x
        if not produced:
            # an empty epoch would otherwise busy-spin this loop forever
            # with the consumer blocked (e.g. batch size > dataset size)
            raise ValueError(
                "epoch sampler produced no batches — is the batch size "
                "(N_rand / events_N_rand) larger than the dataset?")


class Prefetcher:
    """Background-thread batch prefetcher with device placement.

    ``make_batch``: zero-arg callable assembling the next host batch (a
    pytree of numpy arrays). Batches are ``jax.device_put`` on the producer
    thread (async dispatch), so ``next()`` returns arrays that are already
    on (or in flight to) the device.
    """

    def __init__(self, make_batch: Callable[[], dict], buffer_size: int = 2,
                 device=None, sharding=None, put_fn=None):
        self._make_batch = make_batch
        self._device = device
        self._sharding = sharding
        self._put_fn = put_fn
        self._queue: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            while not self._stop.is_set():
                batch = self._make_batch()
                target = self._sharding or self._device
                if self._put_fn is not None:
                    # multi-host: device_put can't place onto a sharding
                    # that spans other processes' devices; the put_fn
                    # builds global arrays instead (parallel/multihost.py)
                    batch = self._put_fn(batch)
                elif target is not None:
                    batch = jax.device_put(batch, target)
                elif jax.default_backend() != "cpu":
                    batch = jax.device_put(batch)
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:   # surfaced on the consumer side
            self._error = e

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            if self._error is not None:
                raise self._error
            try:
                return self._queue.get(timeout=1.0)
            except queue.Empty:
                if not self._thread.is_alive() and self._error is None:
                    raise StopIteration
                continue

    def close(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
