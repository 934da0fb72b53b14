"""Sharding rules: parameter/cache pytrees -> NamedSharding pytrees.

TP shards the head-major output dims of attention projections and the FFN
hidden dim (column-parallel w1/w3, row-parallel w2/wo — GSPMD inserts the
psum). EP shards the stacked routed-expert axis. DP shards the cache batch
dim. Every QTensor variant's packed fields scale proportionally with the
logical (out, in) dims, so one logical PartitionSpec applies to all fields of
a tensor; ``_fit`` drops any axis that doesn't divide evenly (e.g. per-tensor
fp8 scales, odd vocab sizes) rather than failing.
"""

from __future__ import annotations

import logging

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepseek_tpu.config import ModelConfig
from deepseek_tpu.models.kvcache import KVCache
from deepseek_tpu.models.params import LayerParams, ModelParams


_log = logging.getLogger("deepseek_tpu.sharding")
_warned: set = set()


def _fit(arr, spec: tuple, mesh: Mesh) -> P:
    """Clamp a logical spec to what the array's shape actually supports.

    Dropping an axis replicates the tensor — correct but a silent perf/memory
    cliff for large tensors, so it is logged once per (shape, axis)."""
    dims = []
    for i in range(arr.ndim):
        ax = spec[i] if i < len(spec) else None
        if ax is not None and arr.shape[i] % mesh.shape[ax] == 0:
            dims.append(ax)
        else:
            if (ax is not None and mesh.shape[ax] > 1
                    and arr.size * arr.dtype.itemsize > 1 << 20):
                key = (arr.shape, i, ax)
                if key not in _warned:
                    _warned.add(key)
                    _log.warning(
                        "replicating %s dim %d (size %d %% %s=%d != 0): "
                        "%.1f MB per device instead of sharded",
                        arr.shape, i, arr.shape[i], ax, mesh.shape[ax],
                        arr.size * arr.dtype.itemsize / 1e6)
            dims.append(None)
    return P(*dims)


def _qt(qt, spec: tuple, mesh: Mesh):
    if qt is None:
        return None
    return jax.tree.map(lambda a: NamedSharding(mesh, _fit(a, spec, mesh)), qt)


def _rep(arr, mesh: Mesh):
    if arr is None:
        return None
    return jax.tree.map(lambda a: NamedSharding(mesh, P()), arr)


# logical specs; leading axis names applied to as many dims as each field has
COL = ("tensor", None)          # column-parallel: shard out features
ROW = (None, "tensor")          # row-parallel: shard in features (psum after)
EXP = ("expert", None, None)    # stacked experts
REPL = ()


def _layer_shardings(lp: LayerParams, moe: bool, mesh: Mesh) -> LayerParams:
    return LayerParams(
        attn_norm=_rep(lp.attn_norm, mesh),
        ffn_norm=_rep(lp.ffn_norm, mesh),
        kv_a_norm=_rep(lp.kv_a_norm, mesh),
        q_a_norm=_rep(lp.q_a_norm, mesh),
        wkv_a=_qt(lp.wkv_a, REPL, mesh),
        wo=_qt(lp.wo, ROW, mesh),
        wq=_qt(lp.wq, COL, mesh),
        wq_a=_qt(lp.wq_a, REPL, mesh),
        wq_b=_qt(lp.wq_b, COL, mesh),
        wkv_b=_qt(lp.wkv_b, COL, mesh),
        wc=_qt(lp.wc, COL, mesh),
        wq_rope_b=_qt(lp.wq_rope_b, COL, mesh),
        wv_b=_qt(lp.wv_b, COL, mesh),
        w1=_qt(lp.w1, EXP if moe else COL, mesh),
        w2=_qt(lp.w2, EXP if moe else ROW, mesh),
        w3=_qt(lp.w3, EXP if moe else COL, mesh),
        shared_w1=_qt(lp.shared_w1, COL, mesh),
        shared_w2=_qt(lp.shared_w2, ROW, mesh),
        shared_w3=_qt(lp.shared_w3, COL, mesh),
        moegate=_rep(lp.moegate, mesh),
        moegate_bias=_rep(lp.moegate_bias, mesh),
    )


def param_shardings(params: ModelParams, cfg: ModelConfig, mesh: Mesh) -> ModelParams:
    from deepseek_tpu.models.params import MTPParams

    layers = [_layer_shardings(lp, cfg.is_moe_layer(l), mesh)
              for l, lp in enumerate(params.layers)]
    mtp = None
    if params.mtp is not None:
        # the MTP drafter runs replicated (it is a single-host drafting
        # loop); its block still follows the layer rules so the weights
        # shard consistently when present on a mesh
        mtp = MTPParams(
            enorm=_rep(params.mtp.enorm, mesh),
            hnorm=_rep(params.mtp.hnorm, mesh),
            eh_proj=_qt(params.mtp.eh_proj, REPL, mesh),
            block=_layer_shardings(
                params.mtp.block, params.mtp.block.moegate is not None, mesh),
            final_norm=_rep(params.mtp.final_norm, mesh),
        )
    return ModelParams(
        embed=_qt(params.embed, REPL, mesh),
        layers=layers,
        final_norm=_rep(params.final_norm, mesh),
        lm_head=_qt(params.lm_head, COL, mesh),
        mtp=mtp,
    )


def cache_shardings(cache: KVCache, cfg: ModelConfig, mesh: Mesh) -> KVCache:
    def fit(arr, spec):
        if arr is None:
            return None
        return NamedSharding(mesh, _fit(arr, spec, mesh))
    return KVCache(
        # KV caches shard along the window on 'seq' (no-op at seq=1):
        # sequence-parallel attention with a flash merge of shard partials;
        # the MHA caches additionally shard heads on 'tensor'
        k=fit(cache.k, (None, "data", "seq", "tensor", None)),
        v=fit(cache.v, (None, "data", "seq", "tensor", None)),
        ckv=fit(cache.ckv, (None, "data", "seq", None)),
        krope=fit(cache.krope, (None, "data", "seq", None)),
        k_s=fit(cache.k_s, (None, "data", "seq", "tensor")),
        v_s=fit(cache.v_s, (None, "data", "seq", "tensor")),
        ckv_s=fit(cache.ckv_s, (None, "data", "seq")),
        krope_s=fit(cache.krope_s, (None, "data", "seq")),
        sink_krope=fit(cache.sink_krope, (None, "data", None, None)),
        sink_k=fit(cache.sink_k, (None, "data", None, "tensor", None)),
    )


def _place(tree, shardings):
    """device_put single-process; multi-process (jax.distributed) builds
    GLOBAL arrays from the per-host copy via make_array_from_callback —
    every process holds the same host value (deterministic load), each
    contributes its addressable shards."""
    if jax.process_count() <= 1:
        return jax.device_put(tree, shardings)
    import numpy as np

    def put(arr, ns):
        if arr is None:
            return None
        a = np.asarray(arr)
        return jax.make_array_from_callback(a.shape, ns, lambda idx: a[idx])
    return jax.tree.map(put, tree, shardings,
                        is_leaf=lambda x: x is None)


def shard_params(params: ModelParams, cfg: ModelConfig, mesh: Mesh) -> ModelParams:
    from deepseek_tpu.models.params import StackedLayers
    if any(isinstance(e, StackedLayers) for e in params.layers):
        # scanned layer stacks are a single-chip layout (the per-layer
        # sharding specs below assume flat layers); auto-unstack like we
        # auto-unfuse — the transient costs a stacked-group copy, so
        # multi-chip loads should prefer Engine(scan_layers=False)
        import logging
        logging.getLogger("deepseek_tpu.sharding").warning(
            "shard_params got StackedLayers (scan_layers engaged); "
            "unstacking for mesh placement — build the Engine with "
            "scan_layers=False to avoid the stack+unstack transient")
        from deepseek_tpu.models.loader import unstack_layer_groups
        params = unstack_layer_groups(params)
    # fused projection pairs (loader.fuse_projections) are a single-chip
    # layout: TP splits rows per projection, so unfuse before placing
    from deepseek_tpu.models.loader import unfuse_projections
    params = unfuse_projections(params, cfg)
    return _place(params, param_shardings(params, cfg, mesh))


def shard_cache(cache: KVCache, cfg: ModelConfig, mesh: Mesh) -> KVCache:
    return _place(cache, cache_shardings(cache, cfg, mesh))


def _specs(tree):
    return jax.tree.map(
        lambda s: s.spec, tree,
        is_leaf=lambda x: isinstance(x, NamedSharding))


def param_pspecs(params: ModelParams, cfg: ModelConfig, mesh: Mesh):
    """PartitionSpec pytree for shard_map in_specs (same rules as
    param_shardings)."""
    return _specs(param_shardings(params, cfg, mesh))


def cache_pspecs(cache: KVCache, cfg: ModelConfig, mesh: Mesh):
    return _specs(cache_shardings(cache, cfg, mesh))
