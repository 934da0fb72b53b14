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

Composition (PP x TP/EP): with ``mesh_shape`` each stage owns a Mesh of
``prod(mesh_shape)`` devices instead of one — stage weights shard by the
standard TP/EP rules (parallel.sharding) and the stage body runs under
shard_map with explicit collectives, exactly the make_forward(mesh=...)
body restricted to the stage's layer range. Activations cross stage
boundaries replicated (they are psum-restored inside each stage), so the
inter-stage hop stays a plain device_put.
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


def _stage_body(cfg: ModelConfig, lo: int, first: bool, last: bool,
                prefill: bool, logits_mode: str, ctx):
    """The per-stage computation, shared by the single-device path
    (ctx=NULL_CTX) and the per-stage-mesh shard_map path (PP x TP/EP)."""

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
            cfg, prefill, impl, ctx, layer_base=lo)
        if not last or logits_mode == "none":
            # non-final stages forward activations; a "none" final stage
            # returns them too (ignored) so the output structure is static
            return x, cache
        return final_logits(sp.final_norm, sp.lm_head, x, cfg, impl,
                            logits_mode, gather=ctx.gather_logits), cache

    return fn


def _make_stage_fn(cfg: ModelConfig, lo: int, hi: int, first: bool,
                   last: bool, prefill: bool, logits_mode: str,
                   mesh=None, ex_params=None, ex_cache=None):
    if mesh is None:
        from deepseek_tpu.parallel.spmd import NULL_CTX
        return jax.jit(_stage_body(cfg, lo, first, last, prefill,
                                   logits_mode, NULL_CTX),
                       donate_argnums=(1,))

    # PP x TP/EP: the stage body runs under shard_map over the stage's own
    # mesh — stage weights are local TP/EP shards, collectives stay inside
    # the stage, and the activations enter/leave replicated.
    from jax.sharding import PartitionSpec as P
    from deepseek_tpu.parallel.sharding import cache_pspecs, param_pspecs
    from deepseek_tpu.parallel.spmd import make_ctx
    # stage-local config: the dense/MoE boundary shifts with the layer
    # range (param_pspecs classifies by LOCAL index; must match the
    # placement Pipeline.__init__ made with the same shift)
    scfg = dataclasses.replace(
        cfg, n_layers=hi - lo,
        first_k_dense_replace=max(0, cfg.first_k_dense_replace - lo))
    ctx = make_ctx(scfg, mesh)
    pspec = param_pspecs(ex_params, scfg, mesh)
    cspec = cache_pspecs(ex_cache, scfg, mesh)
    fn = jax.shard_map(
        _stage_body(cfg, lo, first, last, prefill, logits_mode, ctx),
        mesh=mesh, in_specs=(pspec, cspec, P(), P()),
        out_specs=(P(), cspec), check_vma=False)
    return jax.jit(fn, donate_argnums=(1,))


@dataclasses.dataclass
class _Stage:
    device: object          # one Device, or a Mesh (PP x TP/EP)
    lo: int
    hi: int
    params: ModelParams
    cache: object           # whole-batch cache (None while microbatched)
    fns: dict
    mesh: object = None
    mb_caches: Optional[list] = None   # persistent per-microbatch caches


class Pipeline:
    """Stage-sharded inference executor.

    ``decode_step`` / ``prefill`` run the whole batch straight through;
    ``decode_microbatched`` splits the batch into microbatches whose
    dispatches overlap across stages (host-enqueued pipelining).
    """

    def __init__(self, cfg: ModelConfig, params: ModelParams,
                 n_stages: int, batch: int = 1,
                 devices: Optional[Sequence] = None,
                 mesh_shape: Optional[dict] = None):
        """``mesh_shape`` (e.g. ``{"tensor": 2}`` or
        ``{"expert": 2, "tensor": 2}``) gives every stage its own Mesh of
        ``prod(mesh_shape)`` consecutive devices: PP x TP/EP composition.
        Stage weights shard by the standard rules (parallel.sharding) and
        the stage body runs under shard_map; activations cross stages
        replicated. Without it each stage is one device."""
        devices = list(devices if devices is not None else jax.devices())
        per_stage = 1
        if mesh_shape:
            assert set(mesh_shape) <= {"expert", "tensor"}, \
                "per-stage meshes shard model axes; batch/seq stay whole"
            for v in mesh_shape.values():
                per_stage *= v
        assert len(devices) >= n_stages * per_stage, \
            f"need {n_stages * per_stage} devices"
        # stage slicing below indexes params.layers per layer; expand any
        # scanned stacks first (each stage may re-stack its own slice via
        # run_layer_stack if the caller stacked the sub-params)
        from deepseek_tpu.models.loader import unstack_layer_groups
        params = unstack_layer_groups(params)
        if mesh_shape:
            # fused projections are a single-chip layout (TP splits rows
            # per projection) — shard_params would unfuse per stage, but
            # the stage fn's pspecs are derived from the placed tree, so
            # normalize up front
            from deepseek_tpu.models.loader import unfuse_projections
            params = unfuse_projections(params, cfg)
        self.cfg = cfg
        self.n_stages = n_stages
        self.stages: List[_Stage] = []
        for s, (lo, hi) in enumerate(stage_bounds(cfg.n_layers, n_stages)):
            sub = ModelParams(
                embed=params.embed if s == 0 else None,
                layers=list(params.layers[lo:hi]),
                final_norm=params.final_norm if s == n_stages - 1 else None,
                lm_head=params.lm_head if s == n_stages - 1 else None,
                mtp=None,
            )
            # stage-local config: layer indices shift by lo, so the
            # dense/MoE boundary must shift too (param_shardings and
            # make_ctx classify layers by LOCAL index)
            scfg = dataclasses.replace(
                cfg, n_layers=hi - lo,
                first_k_dense_replace=max(0, cfg.first_k_dense_replace - lo))
            if mesh_shape:
                from deepseek_tpu.parallel import (
                    make_mesh, shard_cache, shard_params,
                )
                stage_devs = devices[s * per_stage:(s + 1) * per_stage]
                mesh = make_mesh(devices=stage_devs, **mesh_shape)
                sub = shard_params(sub, scfg, mesh)
                cache = shard_cache(init_cache(scfg, batch=batch),
                                    scfg, mesh)
                self.stages.append(_Stage(stage_devs[0], lo, hi, sub,
                                          cache, {}, mesh=mesh))
            else:
                dev = devices[s]
                sub = jax.device_put(sub, dev)
                cache = jax.device_put(init_cache(scfg, batch=batch), dev)
                self.stages.append(_Stage(dev, lo, hi, sub, cache, {}))

    def _fn(self, s: int, prefill: bool, logits_mode: str):
        st = self.stages[s]
        key = (prefill, logits_mode)
        if key not in st.fns:
            ex_cache = None
            if st.mesh is not None:
                ex_cache = (st.cache if st.cache is not None
                            else st.mb_caches[0])
            st.fns[key] = _make_stage_fn(
                self.cfg, st.lo, st.hi, first=(s == 0),
                last=(s == self.n_stages - 1), prefill=prefill,
                logits_mode=logits_mode, mesh=st.mesh,
                ex_params=st.params if st.mesh is not None else None,
                ex_cache=ex_cache)
        return st.fns[key]

    def _place(self, x, st: _Stage):
        if st.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            return jax.device_put(x, NamedSharding(st.mesh, P()))
        return jax.device_put(x, st.device)

    def _whole_batch(self) -> None:
        """Re-merge persistent microbatch caches into the whole-batch
        layout (one concat, only when switching execution shapes)."""
        for st in self.stages:
            if st.mb_caches is not None:
                st.cache = jax.tree.map(
                    lambda *parts: None if parts[0] is None
                    else jnp.concatenate(parts, axis=1),
                    *st.mb_caches, is_leaf=lambda v: v is None)
                st.mb_caches = None

    def _run(self, xin, pos0, prefill: bool, logits_mode: str,
             micro: Optional[int] = None):
        """One pass through all stages; ``micro`` selects the persistent
        per-microbatch cache index instead of the whole-batch cache."""
        x = xin
        out = None
        for s, st in enumerate(self.stages):
            x = self._place(x, st)
            cache = st.cache if micro is None else st.mb_caches[micro]
            out, cache = self._fn(s, prefill, logits_mode)(
                st.params, cache, x, pos0)
            if micro is None:
                st.cache = cache
            else:
                st.mb_caches[micro] = cache
            x = out
        return out

    def prefill(self, tokens, pos0=0, logits_mode: str = "last"):
        self._whole_batch()
        return self._run(jnp.asarray(tokens, jnp.int32), pos0,
                         True, logits_mode)

    def decode_step(self, tok, pos0):
        self._whole_batch()
        return self._run(jnp.asarray(tok, jnp.int32), pos0, False, "last")

    def decode_microbatched(self, tok, pos0, n_micro: int):
        """Split the batch into ``n_micro`` groups and enqueue each through
        every stage back-to-back; async dispatch overlaps group m on stage
        s with group m+1 on stage s-1 (the pipeline schedule).

        Microbatch caches are PERSISTENT: the whole-batch cache is split
        once when the microbatch shape is first used (and re-merged only
        when a whole-batch call follows) — steady-state microbatched
        decode copies no cache bytes, each group's cache is donated
        through its own dispatch chain."""
        tok = jnp.asarray(tok, jnp.int32)
        B = tok.shape[0]
        assert B % n_micro == 0
        mb = B // n_micro
        pos_b = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32).reshape(-1),
                                 (B,))
        if any(st.mb_caches is None or len(st.mb_caches) != n_micro
               for st in self.stages):
            self._whole_batch()   # normalize, then split every stage once
            for st in self.stages:
                st.mb_caches = [
                    jax.tree.map(
                        lambda a, m=m: None if a is None
                        else a[:, m * mb:(m + 1) * mb],
                        st.cache, is_leaf=lambda v: v is None)
                    for m in range(n_micro)
                ]
                st.cache = None
        outs = []
        for m in range(n_micro):
            sl = slice(m * mb, (m + 1) * mb)
            outs.append(self._run(tok[sl], pos_b[sl], False, "last",
                                  micro=m))
        return jnp.concatenate(outs, axis=0)
