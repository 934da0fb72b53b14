"""Pipeline parallelism: contiguous layer stages on disjoint devices.

The last parallelism row of SURVEY.md §2b: stage sharding for checkpoints
too large for one host's HBM (multi-host DeepSeek-V3 over DCN; the
reference runs everything in one address space, model.h:258-263).

TPU-native single-controller design: each stage owns a contiguous layer
range — its slice of the weights and a per-stage KV cache live on that
stage's device — and a per-stage jitted function runs the range through
``models.deepseek.run_layer_stack``. Activations hop between stages with
``jax.device_put`` (ICI within a slice, DCN across hosts). Because JAX
dispatch is asynchronous, a host loop that enqueues microbatches
back-to-back PIPELINES them with no explicit schedule: while microbatch m
executes on stage s, microbatch m+1 executes on stage s-1 — the
per-device execution queues are the pipeline.

Composition: each stage device can itself be a mesh (TP/EP within the
stage via the shard_map path); this module keeps one device per stage,
the layout that matters for fitting a model across hosts.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from deepseek_tpu.config import ModelConfig
from deepseek_tpu.models.deepseek import (
    decode_positions, final_logits, run_layer_stack,
)
from deepseek_tpu.models.kvcache import init_cache
from deepseek_tpu.models.params import ModelParams, embed_lookup
from deepseek_tpu.ops.matmul import kernel_impl


def stage_bounds(n_layers: int, n_stages: int) -> List[tuple]:
    """Contiguous [lo, hi) layer ranges, earlier stages one layer larger
    when n_layers % n_stages != 0 (stage 0 also runs the embedding)."""
    assert 1 <= n_stages <= n_layers
    base, rem = divmod(n_layers, n_stages)
    bounds, lo = [], 0
    for s in range(n_stages):
        hi = lo + base + (1 if s < rem else 0)
        bounds.append((lo, hi))
        lo = hi
    return bounds


def _positions(cfg: ModelConfig, B: int, T: int, pos0, prefill: bool):
    """Position math per mode — the decode ring/sink case is the shared
    ``models.deepseek.decode_positions`` (so pipeline and single-graph
    execution cannot diverge on ring semantics)."""
    pos0 = jnp.asarray(pos0, jnp.int32)
    if prefill:
        assert pos0.ndim == 0, "prefill requires a shared scalar position"
        pos_vec = pos0 + jnp.arange(T, dtype=jnp.int32)
        return pos_vec, pos0, None, None
    assert T == 1
    return decode_positions(cfg, B, pos0)


def _make_stage_fn(cfg: ModelConfig, lo: int, hi: int, first: bool,
                   last: bool, prefill: bool, logits_mode: str):
    from deepseek_tpu.parallel.spmd import NULL_CTX

    def fn(sp: ModelParams, cache, xin, pos0):
        impl = kernel_impl(cfg, prefill=prefill)
        dtype = jnp.dtype(cfg.compute_dtype)
        if first:
            B, T = xin.shape
            x = embed_lookup(sp.embed, xin, jnp.float32).astype(dtype)
        else:
            B, T = xin.shape[:2]
            x = xin.astype(dtype)
        pos_vec, cache_start, kv_len, kv_sink = _positions(
            cfg, B, T, pos0, prefill)
        x, cache, _ = run_layer_stack(
            sp.layers, cache, x, pos_vec, cache_start, kv_len, kv_sink,
            cfg, prefill, impl, NULL_CTX, layer_base=lo)
        if not last:
            return x, cache
        if logits_mode == "none":
            return None, cache
        return final_logits(sp.final_norm, sp.lm_head, x, cfg, impl,
                            logits_mode), cache

    return jax.jit(fn, donate_argnums=(1,))


@dataclasses.dataclass
class _Stage:
    device: object
    lo: int
    hi: int
    params: ModelParams
    cache: object
    fns: dict


class Pipeline:
    """Stage-sharded inference executor.

    ``decode_step`` / ``prefill`` run the whole batch straight through;
    ``decode_microbatched`` splits the batch into microbatches whose
    dispatches overlap across stages (host-enqueued pipelining).
    """

    def __init__(self, cfg: ModelConfig, params: ModelParams,
                 n_stages: int, batch: int = 1,
                 devices: Optional[Sequence] = None):
        devices = list(devices if devices is not None else jax.devices())
        assert len(devices) >= n_stages, "one device per stage"
        # stage slicing below indexes params.layers per layer; expand any
        # scanned stacks first (each stage may re-stack its own slice via
        # run_layer_stack if the caller stacked the sub-params)
        from deepseek_tpu.models.loader import unstack_layer_groups
        params = unstack_layer_groups(params)
        self.cfg = cfg
        self.n_stages = n_stages
        self.stages: List[_Stage] = []
        for s, (lo, hi) in enumerate(stage_bounds(cfg.n_layers, n_stages)):
            dev = devices[s]
            sub = ModelParams(
                embed=params.embed if s == 0 else None,
                layers=list(params.layers[lo:hi]),
                final_norm=params.final_norm if s == n_stages - 1 else None,
                lm_head=params.lm_head if s == n_stages - 1 else None,
                mtp=None,
            )
            sub = jax.device_put(sub, dev)
            scfg = dataclasses.replace(cfg, n_layers=hi - lo)
            cache = jax.device_put(init_cache(scfg, batch=batch), dev)
            self.stages.append(_Stage(dev, lo, hi, sub, cache, {}))

    def _fn(self, s: int, prefill: bool, logits_mode: str):
        st = self.stages[s]
        key = (prefill, logits_mode)
        if key not in st.fns:
            st.fns[key] = _make_stage_fn(
                self.cfg, st.lo, st.hi, first=(s == 0),
                last=(s == self.n_stages - 1), prefill=prefill,
                logits_mode=logits_mode)
        return st.fns[key]

    def _run(self, xin, pos0, prefill: bool, logits_mode: str,
             caches: Optional[list] = None):
        """One pass through all stages; ``caches`` overrides stage caches
        (microbatched slices)."""
        x = xin
        out = None
        new_caches = []
        for s, st in enumerate(self.stages):
            x = jax.device_put(x, st.device)
            cache = st.cache if caches is None else caches[s]
            out, cache = self._fn(s, prefill, logits_mode)(
                st.params, cache, x, pos0)
            if caches is None:
                st.cache = cache
            else:
                new_caches.append(cache)
            x = out
        return out, new_caches

    def prefill(self, tokens, pos0=0, logits_mode: str = "last"):
        out, _ = self._run(jnp.asarray(tokens, jnp.int32), pos0,
                           True, logits_mode)
        return out

    def decode_step(self, tok, pos0):
        out, _ = self._run(jnp.asarray(tok, jnp.int32), pos0,
                           False, "last")
        return out

    def decode_microbatched(self, tok, pos0, n_micro: int):
        """Split the batch into ``n_micro`` groups and enqueue each through
        every stage back-to-back; async dispatch overlaps group m on stage
        s with group m+1 on stage s-1 (the pipeline schedule)."""
        tok = jnp.asarray(tok, jnp.int32)
        B = tok.shape[0]
        assert B % n_micro == 0
        mb = B // n_micro
        pos_b = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32).reshape(-1),
                                 (B,))
        # per-stage caches sliced per microbatch (batch is the cache's
        # second axis); sliced copies are merged back after the sweep
        outs = []
        merged = [[] for _ in self.stages]
        for m in range(n_micro):
            sl = slice(m * mb, (m + 1) * mb)
            caches = [
                jax.tree.map(lambda a: None if a is None else a[:, sl],
                             st.cache, is_leaf=lambda v: v is None)
                for st in self.stages
            ]
            out, new_caches = self._run(tok[sl], pos_b[sl], False, "last",
                                        caches=caches)
            outs.append(out)
            for s, c in enumerate(new_caches):
                merged[s].append(c)
        for s, st in enumerate(self.stages):
            st.cache = jax.tree.map(
                lambda *parts: None if parts[0] is None
                else jnp.concatenate(parts, axis=1),
                *merged[s], is_leaf=lambda v: v is None)
        return jnp.concatenate(outs, axis=0)
