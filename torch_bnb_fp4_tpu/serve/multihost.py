"""Multi-host serving: HTTP on process 0, SPMD engine loop on every process.

The Engine's host loop is SPMD — with a process-spanning mesh, every process
must call submit()/step() in lockstep with identical arguments or the
device program streams desync (engine.py "multi-host" notes).  This module
closes the loop at the PRODUCT level (the 2-process engine test feeds both
processes by hand; a real deployment has one front-end):

  * process 0 runs the normal :class:`EngineServer` HTTP front-end; at the
    top of every engine tick it broadcasts the tick's newly-accepted
    requests + abort uids to all processes (two small
    ``multihost_utils.broadcast_one_to_all`` collectives: payload size,
    then pickled payload);
  * every other process runs :func:`follow`, which blocks on the same
    broadcasts, applies the identical submissions, and steps its engine —
    no sockets, no divergent control flow;
  * the broadcast itself is the tick barrier: an idle process 0 parks in
    its submission queue (<= ``idle_poll_s``) before broadcasting an empty
    tick, so followers never spin.

The reference is single-process single-GPU (SURVEY.md §2.3); multi-host
serving coordination is north-star scope.  Tested end-to-end over real
sockets in the 2-process fixture (tests/multihost_worker.py): completions
served over HTTP on rank 0 match the single-process oracle token-for-token
and every rank's engine state agrees.
"""

from __future__ import annotations

import logging
import pickle
import queue

import jax
import numpy as np

from .engine import Engine
from .server import EngineServer

log = logging.getLogger("torch_bnb_fp4_tpu.serve.multihost")


def _broadcast_blob(obj) -> object:
    """Broadcast a picklable object from process 0 to all processes.

    Two collectives: the payload size (fixed (1,) i32 — non-source values
    are ignored but shapes must match), then the payload bytes.
    """
    from jax.experimental import multihost_utils

    if jax.process_index() == 0:
        payload = np.frombuffer(pickle.dumps(obj), np.uint8)
        n = np.asarray([payload.size], np.int32)
    else:
        payload = None
        n = np.zeros(1, np.int32)
    n = int(np.asarray(multihost_utils.broadcast_one_to_all(n))[0])
    if payload is None:
        payload = np.zeros(n, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(payload))
    return pickle.loads(out.tobytes())


class MultihostEngineServer(EngineServer):
    """EngineServer for process 0 of a multi-process engine: each tick's
    submissions/aborts are broadcast so follower processes stay in lockstep.
    Construct only on process 0; run :func:`follow` everywhere else."""

    def __init__(self, engine: Engine, host: str = "127.0.0.1", port: int = 8000,
                 tokenizer=None, idle_poll_s: float = 0.2):
        assert jax.process_index() == 0, "HTTP front-end lives on process 0"
        super().__init__(engine, host, port, tokenizer=tokenizer)
        self._idle_poll_s = idle_poll_s

    def _engine_tick(self) -> None:
        # gather this tick's news (park briefly when idle, like the base)
        reqs, rejects = [], []
        try:
            req = self._subq.get(timeout=0.0 if self._busy() else self._idle_poll_s)
            while True:
                reqs.append(req)
                req = self._subq.get_nowait()
        except queue.Empty:
            pass
        aborts = []
        while not self._abortq.empty():
            try:
                aborts.append(self._abortq.get_nowait())
            except queue.Empty:
                break
        # one blob per tick, even when empty: the broadcast is the barrier
        _broadcast_blob({"reqs": reqs, "aborts": [u for u, _ in aborts], "stop": False})
        for req in reqs:
            try:
                self.engine.submit(req)
            except ValueError as e:  # deterministic: followers reject identically
                rejects.append((req.uid, str(e)))
        for uid, err in rejects:
            p = self._pending.pop(uid, None)
            if p is not None:
                p.error = err
                if p.stream_q is not None:
                    p.stream_q.put(None)
                p.done.set()
        for uid, holder in aborts:
            holder["aborted"] = self.engine.abort(uid)
            holder["done"].set()
        if self._busy():
            self.engine.step()
        # fan out finished completions (same as the base tick)
        comps = self.engine.completions
        while self._consumed < len(comps):
            c = comps[self._consumed]
            self._consumed += 1
            p = self._pending.pop(c.uid, None)
            if p is not None:
                p.completion = c
                if p.stream_q is not None:
                    p.stream_q.put(None)
                p.done.set()
        if self._consumed >= 256:
            del comps[: self._consumed]
            self._consumed = 0

    def stop(self) -> None:
        # release followers before tearing the loop down
        self._stop.set()
        self._engine_thread.join(timeout=30)
        _broadcast_blob({"reqs": [], "aborts": [], "stop": True})
        self._httpd.shutdown()
        self._httpd.server_close()


def follow(engine: Engine) -> None:
    """Run the SPMD engine loop on a follower process (process_index != 0):
    block on each tick's broadcast, apply the identical submissions/aborts,
    step.  Returns when process 0's server stops."""
    assert jax.process_index() != 0, "process 0 runs MultihostEngineServer"
    while True:
        tick = _broadcast_blob(None)
        if tick["stop"]:
            return
        for req in tick["reqs"]:
            try:
                engine.submit(req)
            except ValueError:
                pass  # identical deterministic rejection on every process
        for uid in tick["aborts"]:
            engine.abort(uid)
        if engine.pending or any(r is not None for r in engine.slot_req) or engine._pf is not None:
            engine.step()
