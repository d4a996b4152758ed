"""Batched streaming serving: multiplex concurrent ``/api/tts-stream``
clients through ONE KV-cached batched decode scan.

AR decode is HBM-bandwidth-bound — every token step re-reads the full GPT
weights — so decoding B concurrent streams in one batch costs barely more
wall time per chunk than one stream (the weight reads are shared; see
``models/xtts/model.py`` ``inference_stream_batched``). The single-stream
server path leaves that capacity on the floor: each connection holds the
device for its whole utterance. This module is the serving bridge:

- arrivals inside a short window are grouped (same language / conditioning
  shape / sampling config), prefilled together, and decoded as one batch;
- multiple in-flight groups interleave on the device at CHUNK granularity
  (round-robin), so a new arrival's time-to-first-audio is bounded by one
  window + prefill + one chunk per active group — not by the duration of
  utterances already streaming;
- each client pulls its own crossfaded chunks from a per-request queue,
  decoupling a slow reader's socket from the device loop.

No reference counterpart: the reference streams strictly one request at a
time at the model layer (``TTS/tts/models/xtts.py:611``) and its server
holds a global lock per request (``TTS/server/server.py:187``).
"""

from __future__ import annotations

import itertools
import threading
import time
from collections import deque
from queue import Queue
from typing import Iterator, List, Optional

import numpy as np

_DONE = object()


class _StreamReq:
    __slots__ = ("text", "language", "cond", "spk", "kwargs", "out")

    def __init__(self, text, language, cond, spk, kwargs):
        self.text = text
        self.language = language
        self.cond = cond
        self.spk = spk
        self.kwargs = kwargs
        self.out: Queue = Queue()

    def group_key(self):
        return (
            self.language,
            tuple(np.shape(self.cond)),
            tuple(np.shape(self.spk)),
            tuple(sorted(self.kwargs.items())),
        )


class _Group:
    __slots__ = ("gen", "members", "done")

    def __init__(self, gen, members):
        self.gen = gen
        self.members = members
        self.done = [False] * len(members)


class StreamBatcher:
    """Queue + worker that batches concurrent streaming requests into
    shared batched decode scans."""

    def __init__(self, synthesizer, max_batch: int = 4, window_ms: float = 50.0):
        model = synthesizer.tts_model
        if not hasattr(model, "inference_stream_batched"):
            raise ValueError(
                "StreamBatcher needs a model with a batched streaming decode "
                "(inference_stream_batched, e.g. XTTS); other models keep the "
                "serial streaming path"
            )
        self.synthesizer = synthesizer
        self.model = model
        self.max_batch = int(max_batch)
        self.window_s = float(window_ms) / 1000.0
        self._pending: deque = deque()
        self._cond = threading.Condition()
        self._closed = False
        self._seed = itertools.count(1)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------
    def stream(
        self,
        text: str,
        speaker_name: Optional[str] = None,
        language_name: Optional[str] = None,
        speaker_wav=None,
        **kwargs,
    ) -> Iterator[np.ndarray]:
        """Per-request entry: resolve conditioning in the caller thread
        (file IO / speaker-encoder work stays off the decode worker), split
        into sentences like the serial path, enqueue each, and yield audio
        chunks as the batch worker produces them."""
        from tts_tpu.utils.synthesizer import split_into_sentences

        config = self.synthesizer.tts_config
        cond, spk = self.model.resolve_conditioning(
            config, speaker_id=speaker_name, speaker_wav=speaker_wav
        )
        language = language_name or "en"
        for name in ("temperature", "top_k", "top_p", "repetition_penalty"):
            if hasattr(config, name):
                kwargs.setdefault(name, getattr(config, name))

        sens = split_into_sentences(text) or [text.strip()]
        reqs = [
            _StreamReq(sen, language, cond, spk, kwargs) for sen in sens if sen.strip()
        ]
        if not reqs:
            raise ValueError("No text to speak.")
        with self._cond:
            if self._closed:
                raise RuntimeError("stream batcher closed")
            self._pending.extend(reqs)
            self._cond.notify()
        for req in reqs:
            while True:
                chunk = req.out.get()
                if chunk is _DONE:
                    break
                if isinstance(chunk, BaseException):
                    raise chunk
                yield chunk

    def close(self):
        with self._cond:
            self._closed = True
            self._cond.notify()

    # ------------------------------------------------------------------
    def _admit_locked(self, wait: bool) -> List[_StreamReq]:
        """Pop up to ``max_batch`` compatible pending requests (same group
        key as the head). With ``wait`` (device idle), hold the admission
        window open for batch mates; with active groups, admit instantly —
        the decode loop must not stall."""
        if not self._pending:
            return []
        if wait:
            deadline = time.time() + self.window_s
            while len(self._pending) < self.max_batch:
                remaining = deadline - time.time()
                if remaining <= 0 or self._closed:
                    break
                self._cond.wait(timeout=remaining)
        if not self._pending:
            return []
        key = self._pending[0].group_key()
        members, keep = [], deque()
        while self._pending and len(members) < self.max_batch:
            req = self._pending.popleft()
            (members if req.group_key() == key else keep).append(req)
        keep.extend(self._pending)
        self._pending = keep
        return members

    def _start_group(self, members: List[_StreamReq]) -> Optional[_Group]:
        import jax
        import jax.numpy as jnp

        try:
            cond = jnp.concatenate(
                [jnp.asarray(m.cond) for m in members], axis=0
            )
            spk = jnp.concatenate([jnp.asarray(m.spk) for m in members], axis=0)
            gen = self.model.inference_stream_batched(
                [m.text for m in members],
                members[0].language,
                cond,
                spk,
                rng=jax.random.PRNGKey(next(self._seed)),
                **members[0].kwargs,
            )
            return _Group(gen, members)
        except BaseException as e:  # surfaced per member
            for m in members:
                m.out.put(e)
            return None

    def _step_group(self, group: _Group) -> bool:
        """Advance one chunk; returns False when the group is finished."""
        try:
            chunks = next(group.gen)
        except StopIteration:
            for m, d in zip(group.members, group.done):
                if not d:
                    m.out.put(_DONE)
            return False
        except BaseException as e:
            for m, d in zip(group.members, group.done):
                if not d:
                    m.out.put(e)
            return False
        for i, (m, chunk) in enumerate(zip(group.members, chunks)):
            if group.done[i]:
                continue
            if chunk is None:
                # a finished stream stays None for the rest of the scan
                group.done[i] = True
                m.out.put(_DONE)
            else:
                m.out.put(chunk)
        return True

    def _run(self):
        groups: List[_Group] = []
        while True:
            with self._cond:
                if not groups:
                    while not self._pending and not self._closed:
                        self._cond.wait()
                if self._closed and not self._pending and not groups:
                    return
                members = self._admit_locked(wait=not groups)
            if members:
                g = self._start_group(members)
                if g is not None:
                    groups.append(g)
            # one chunk step per active group: chunk-granular round-robin
            for g in list(groups):
                if not self._step_group(g):
                    groups.remove(g)
