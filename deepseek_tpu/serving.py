"""Continuous batching scheduler.

Beyond the reference (single-prompt, batch-1 — SURVEY.md §2b): multiple
requests share one batched KV cache; finished sequences free their slot and
queued requests are admitted by prefilling the slot in place, while decode
proceeds as one batched step with **per-sequence positions** (the decode
forward takes pos as a (B,) vector; each slot runs its own ring/sink math).

This is the DP-axis serving story on one chip; sharding the batch over the
'data' mesh axis extends it across chips.
"""

from __future__ import annotations

import dataclasses
import itertools
from collections import deque
from typing import Callable, Deque, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepseek_tpu.engine import Engine


@dataclasses.dataclass
class Request:
    prompt_tokens: List[int]
    max_new_tokens: int = 128
    temperature: float = 1.0
    top_p: float = 0.95
    request_id: int = 0
    # filled by the scheduler
    out_tokens: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    on_token: Optional[Callable[[int, bytes], None]] = None


class BatchScheduler:
    def __init__(self, engine: Engine, batch_size: int = 4,
                 decode_block: int = 8):
        self.engine = engine
        self.batch = batch_size
        # tokens decoded per dispatch for the whole batch: amortizes the
        # per-dispatch round trip (~tens of ms on remote-attached chips) at
        # the cost of up to block-1 wasted positions after a sequence stops
        self.block = max(1, decode_block)
        self.cache = engine.new_cache(batch=batch_size)
        self.slots: List[Optional[Request]] = [None] * batch_size
        self.pos = np.zeros(batch_size, np.int64)      # next decode position
        self.cur = np.zeros(batch_size, np.int64)      # token to feed next
        self.queue: Deque[Request] = deque()
        self._ids = itertools.count()
        self._key = jax.random.PRNGKey(0)
        self._loop = None  # built lazily (jit keyed on block size)

    # ------------------------------------------------------------------
    def submit(self, req: Request) -> int:
        req.request_id = next(self._ids)
        self.queue.append(req)
        return req.request_id

    @property
    def has_work(self) -> bool:
        return bool(self.queue) or any(s is not None for s in self.slots)

    # ------------------------------------------------------------------
    def _admit(self, slot: int, req: Request) -> None:
        """Prefill the request's prompt into one slot of the shared cache."""
        eng = self.engine
        # slice out this slot's cache rows, hydrate, write back; jnp.copy
        # because a full-width slice can alias the original array, which
        # hydrate's donated calls would delete
        sub = jax.tree.map(
            lambda a: jnp.copy(a[:, slot:slot + 1]) if a is not None else None,
            self.cache)
        sub, logits, _, pos = eng.hydrate(sub, req.prompt_tokens, 0)
        self.cache = jax.tree.map(
            lambda full, part: None if full is None
            else full.at[:, slot:slot + 1].set(part),
            self.cache, sub, is_leaf=lambda x: x is None)
        token = eng.sampler.sample(logits, req.temperature, req.top_p)
        self._emit(req, token, prev=req.prompt_tokens[-1])
        self.slots[slot] = req
        self.pos[slot] = pos
        self.cur[slot] = token

    def _emit(self, req: Request, token: int, prev: int) -> None:
        req.out_tokens.append(token)
        if req.on_token is not None:
            req.on_token(token, self.engine.tokenizer.decode_one(prev, token))
        if (self.engine.tokenizer.is_eos_or_eot(token)
                or len(req.out_tokens) >= req.max_new_tokens):
            req.done = True

    def _free_finished(self) -> None:
        for i, req in enumerate(self.slots):
            if req is not None and req.done:
                self.slots[i] = None
                self.pos[i] = 0
                self.cur[i] = 0

    # ------------------------------------------------------------------
    def step(self) -> None:
        """Admit queued requests into free slots, then one fused decode
        dispatch of ``block`` tokens for the whole batch — sampling stays on
        device with per-slot temperature/top_p; only the (B, block) token
        ids come back to the host."""
        from deepseek_tpu.models.deepseek import make_decode_loop

        self._free_finished()
        for i in range(self.batch):
            if self.slots[i] is None and self.queue:
                self._admit(i, self.queue.popleft())
        if not any(s is not None for s in self.slots):
            return

        if self._loop is None:
            self._loop = make_decode_loop(self.engine.cfg, self.block)

        temps = np.zeros(self.batch, np.float32)
        topps = np.ones(self.batch, np.float32)
        for i, req in enumerate(self.slots):
            if req is not None:
                temps[i] = req.temperature
                topps[i] = req.top_p
        self._key, sub = jax.random.split(self._key)
        toks_dev, _, self.cache = self._loop(
            self.engine.params, self.cache,
            jnp.asarray(self.cur.reshape(-1, 1), jnp.int32),
            jnp.asarray(self.pos, jnp.int32), sub,
            jnp.asarray(temps), jnp.asarray(topps))
        toks = np.asarray(toks_dev)                     # (B, block)

        for i, req in enumerate(self.slots):
            if req is None or req.done:
                self.pos[i] += self.block
                continue
            prev = int(self.cur[i])
            for j in range(self.block):
                token = int(toks[i, j])
                self._emit(req, token, prev=prev)
                prev = token
                if req.done:
                    break
            self.pos[i] += self.block
            self.cur[i] = prev

    def run(self) -> List[Request]:
        finished: Dict[int, Request] = {}
        while self.has_work:
            self.step()
            for req in self.slots:
                if req is not None and req.done:
                    finished[req.request_id] = req
        return [finished[k] for k in sorted(finished)]
