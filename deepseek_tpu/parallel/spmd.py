"""Explicit-collective SPMD context for the shard_map execution path.

Two ways to run the model on a mesh:

1. **GSPMD** (``shard_params`` + plain ``jit``): XLA infers collectives from
   the NamedShardings. Pallas kernels are opaque to the partitioner, so
   ``make_forward`` detects spanning params on first call and auto-upgrades
   to the shard_map body over the params' own mesh (falling back to
   XLA-dequant kernels only when no standard mesh can be recovered — see
   ``models.deepseek._gspmd_kernel_gate``).
2. **shard_map** (this module): the forward body runs on *local shards* with
   the collectives placed explicitly — psum after row-parallel matmuls
   (attention wo, FFN w2), psum over the expert axis for routed-expert
   partial sums, all-gather of vocab-sharded logits. Inside the body every
   operand is a plain local array, so the Pallas fused-dequant / expert /
   attention kernels run unchanged per shard. This is the scaling design
   the reference lacks entirely (SURVEY.md §2b: its only parallelism is
   OpenMP threads, infer.cpp:137-374).

``SpmdCtx`` carries the mesh-axis facts the model body needs; the default
instance is a no-op so the single-chip path pays nothing.

EP dispatch design note (BASELINE config #5 asks for "all-to-all overlapped
with expert GEMMs"): activations enter the body replicated across the
expert axis (tokens shard over 'data' only), so routing a token to its
expert's shard needs NO all-to-all — each shard locally selects the pairs
it owns (``dispatch_pairs`` for decode, the capacity compaction in
ops.matmul for prefill) and one psum over the expert axis combines the
mixtures. That psum is the only EP collective; it is independent of the
shared-expert/dense compute that follows, so XLA's async collectives hide
it behind those GEMMs — the overlap falls out of the dataflow instead of
being hand-scheduled. An activation all-to-all would only pay off if the
batch were also sharded over the expert axis (dp*ep data shards), which
contradicts serving's replicated-routing layout.

Context-parallel prefill design note (SURVEY §2b names ring attention as
the natural seq-scaling extension): when a prefill chunk's length divides
the seq axis, the chunk ROWS are sharded over 'seq' too — every
projection, FFN/MoE GEMM and lm_head row runs on T/sp rows per shard
instead of being replicated sp times. Attention then needs each query
against every window slice; classical ring attention rotates the KV
slices via ppermute (sp-1 steps, moving the whole per-layer KV cache —
S*(R+P) elements — past every shard). Here the cheaper exchange is the
transpose: all-gather the (skinny) chunk Q/KV rows and reduce-scatter the
flash-merged partials back to row shards (``cp_gather_rows`` /
``cp_merge_scatter``). For MLA shapes the latent cache is FAT (S up to
163k slots of R+P=576) while a chunk's Q is SKINNY (T<=512 rows), so
Q-movement beats KV-movement whenever S*(R+P) > T*H*R / 2 — i.e. always
at long windows, which is when sp>1 is worth running. Both paths are
exact (flash-stat merges); the replicated-row path remains the fallback
for chunks that don't divide sp.
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from deepseek_tpu.config import ModelConfig

# trace-time counters (e.g. "cp_rows" bumps once per CP-prefill trace);
# tests assert on deltas — never affects compiled code
TRACE_COUNTS: collections.Counter = collections.Counter()


def counting_rank(cls, n_cls: int):
    """One-hot-cumsum counting-sort machinery shared by the decode pair
    dispatch (SpmdCtx.dispatch_pairs) and the prefill tile dispatch
    (ops.matmul._ep_owned): returns (within, counts, starts) — each
    element's rank among its class, per-class counts, and exclusive-prefix
    class starts. A sort HLO here would sit on the MoE hot path and TPU
    sorts are milliseconds-slow at pair-list sizes (CLAUDE.md)."""
    oh = jax.nn.one_hot(cls, n_cls, dtype=jnp.int32)
    within = jnp.take_along_axis(
        jnp.cumsum(oh, axis=0) - 1, cls[:, None], axis=1)[:, 0]
    counts = oh.sum(axis=0)
    starts = jnp.cumsum(counts) - counts
    return within, counts, starts


def ep_ownership(flat_idx, flat_w, ctx: "SpmdCtx", e_local: int, live=None):
    """Shared EP-ownership fold: maps global expert ids to this shard's
    local table and zero-weights pairs the shard must not compute
    (non-owned under EP; dead batch rows when ``live`` is given).

    Returns (lidx, keep, w): local expert id (0 where dropped), keep mask
    (None when nothing can be dropped), weights with dropped pairs zeroed.
    """
    if live is not None:
        flat_w = jnp.where(live, flat_w, 0.0)
    if ctx.ep > 1:
        eid = lax.axis_index(ctx.expert_axis)
        keep = (flat_idx // e_local) == eid
        if live is not None:
            keep = keep & live
        lidx = jnp.where(keep, flat_idx % e_local, 0)
        flat_w = jnp.where(keep, flat_w, 0.0)
    elif live is not None:
        keep = live
        lidx = jnp.where(keep, flat_idx, 0)
    else:
        keep = None
        lidx = flat_idx
    return lidx, keep, flat_w


@dataclasses.dataclass(frozen=True)
class SpmdCtx:
    tp: int = 1                  # size of the tensor axis
    ep: int = 1                  # size of the expert axis
    dp: int = 1                  # size of the data axis
    sp: int = 1                  # size of the seq axis (MLA KV cache shards)
    lm_head_tp: bool = False     # lm_head vocab dim actually sharded?
    tensor_axis: str = "tensor"
    expert_axis: str = "expert"
    seq_axis: str = "seq"
    # EP prefill capacity factor (see ops.matmul.ep_prefill_capacity);
    # 0 = exact/no compaction. Only meaningful when ep > 1.
    ep_capacity_factor: float = 0.0
    # context-parallel prefill: the current chunk's rows are sharded over
    # the seq axis (set per-trace by _forward_impl when T % sp == 0, never
    # in make_ctx — decode and non-divisible chunks keep rows replicated)
    cp: bool = False

    def psum_t(self, x):
        """All-reduce a row-parallel matmul's partial sums over TP shards."""
        return lax.psum(x, self.tensor_axis) if self.tp > 1 else x

    def psum_e(self, x):
        """All-reduce routed-expert partial outputs over EP shards."""
        return lax.psum(x, self.expert_axis) if self.ep > 1 else x

    def psum_d(self, x):
        """All-reduce over data shards (global scalar stats, e.g. the EP
        prefill overflow count)."""
        return lax.psum(x, "data") if self.dp > 1 else x

    def local_heads(self, n_heads: int) -> int:
        return n_heads // self.tp

    def gather_logits(self, logits):
        """All-gather vocab-sharded logits into the full row on every shard."""
        if self.lm_head_tp and self.tp > 1:
            return lax.all_gather(logits, self.tensor_axis,
                                  axis=logits.ndim - 1, tiled=True)
        return logits

    def dispatch_pairs(self, idx, weights, n_experts: int,
                       active=None, n_keep: Optional[int] = None):
        """Decode-path EP dispatch: flatten the (B, k) token-expert pairs,
        keep only this shard's ownership (non-owned weights zeroed), and
        SORT the pair list by local expert id with dead pairs (non-owned
        under EP, inactive batch rows) last, aliased to the last live
        expert.

        The sort makes consecutive pairs share their expert whenever
        possible, and ``qmm_experts`` runs the pair axis innermost in its
        grid — Mosaic elides the weight-tile DMA on repeated indices, so a
        shard's HBM expert traffic scales with its DISTINCT owned experts
        (~k/EP per token under EP; distinct-experts-per-batch when ep == 1)
        instead of all B*k pairs. Compute for aliased pairs is wasted but
        decode is bandwidth-bound; psum_e restores the full mixture.

        ``active`` (B,) bool marks live batch rows; dead rows' pairs are
        zero-weighted and sort last. ``n_keep`` (STATIC) truncates the
        sorted list: the per-pair-program fixed cost (~2.5 us on v5e)
        dominates batched decode, so dropping the tail is the only way a
        partially-idle batch gets cheaper — callers must guarantee the
        live pair count <= n_keep (continuous batching: occupancy-bucket
        * k; the dropped tail is then all weight-0 pairs, so truncation
        is exact).

        Returns (local_idx (M,), w (M,), token (M,)) in sorted pair order,
        M = n_keep or B*k.
        """
        B, k = idx.shape
        N = B * k
        flat = idx.reshape(N)
        w = weights.reshape(N)
        tok = jnp.arange(N, dtype=jnp.int32) // k
        live = None
        if active is not None:
            live = active.reshape(B)[tok]           # (N,) bool
        e_local = n_experts // self.ep if self.ep > 1 else n_experts
        lidx, keep, w = ep_ownership(flat, w, self, e_local, live=live)
        if keep is not None:
            cls = jnp.where(keep, lidx, e_local)    # dead pairs sort last
            n_cls = e_local + 1
        else:
            cls = lidx
            n_cls = n_experts
        within, counts, starts = counting_rank(cls, n_cls)
        dest = starts[cls] + within                 # bijective over [0, N)
        src = jnp.zeros((N,), jnp.int32).at[dest].set(
            jnp.arange(N, dtype=jnp.int32))
        lidx_s, w_s, tok_s = lidx[src], w[src], tok[src]
        if keep is not None:
            keep_s = keep[src]
            # alias dead pairs to the LAST live expert id: sorted
            # ascending, so they immediately follow a pair with that id and
            # their weight-tile fetch elides (their weight is already 0)
            alias = jnp.maximum(jnp.max(jnp.where(keep_s, lidx_s, -1)), 0)
            lidx_s = jnp.where(keep_s, lidx_s, alias)
        if n_keep is not None and n_keep < N:
            lidx_s, w_s, tok_s = (lidx_s[:n_keep], w_s[:n_keep],
                                  tok_s[:n_keep])
        return lidx_s, w_s, tok_s

    def expert_slots(self, idx, weights, n_experts: int):
        """Map global top-k expert ids to this shard's local expert table.

        Slots routed to experts this shard does not own point at local
        expert 0 with weight 0 — the compute is wasted but correctness is
        exact, and the psum_e combine restores the full mixture.
        """
        if self.ep <= 1:
            return idx, weights
        e_local = n_experts // self.ep
        eid = lax.axis_index(self.expert_axis)
        owned = (idx // e_local) == eid
        return (jnp.where(owned, idx % e_local, 0),
                jnp.where(owned, weights, 0.0))

    def seq_shard(self, window: int):
        """(shard index, local window length) for the seq-sharded cache."""
        return lax.axis_index(self.seq_axis), window // self.sp

    def seq_merge(self, acc, m, l):
        """Exact flash-style merge of per-shard partial attention:
        acc (B,H,R) unnormalized, m/l (B,H) -> normalized (B,H,R)."""
        if self.sp <= 1:
            return acc / jnp.maximum(l, 1e-30)[..., None]
        mg = lax.pmax(m, self.seq_axis)
        w = jnp.exp(m - mg)
        num = lax.psum(acc * w[..., None], self.seq_axis)
        den = lax.psum(l * w, self.seq_axis)
        return num / jnp.maximum(den, 1e-30)[..., None]

    def cp_rows(self, T: int):
        """(row-shard index, local row count) for a CP-sharded chunk."""
        TRACE_COUNTS["cp_rows"] += 1   # trace-time evidence (tests)
        return lax.axis_index(self.seq_axis), T // self.sp

    def cp_gather_rows(self, x):
        """All-gather chunk-row-sharded values along axis 1 (row order =
        shard order, so the result is the full chunk). None passes through
        (optional int8-scale planes)."""
        if x is None or self.sp <= 1:
            return x
        return lax.all_gather(x, self.seq_axis, axis=1, tiled=True)

    def cp_merge_scatter(self, acc, m, l):
        """Flash-merge partial attention over the full (gathered-Q) chunk
        and keep only this shard's row slice: psum_scatter along rows is
        the reduce-scatter dual of cp_gather_rows, moving 1/sp of the
        bytes a full psum (seq_merge) would. acc (B,T,H,·) unnormalized,
        m/l (B,T,H) -> normalized (B,T/sp,H,·) local rows."""
        if self.sp <= 1:
            return acc / jnp.maximum(l, 1e-30)[..., None]
        mg = lax.pmax(m, self.seq_axis)
        w = jnp.exp(m - mg)
        num = lax.psum_scatter(acc * w[..., None], self.seq_axis,
                               scatter_dimension=1, tiled=True)
        den = lax.psum_scatter(l * w, self.seq_axis,
                               scatter_dimension=1, tiled=True)
        return num / jnp.maximum(den, 1e-30)[..., None]

    def local_expert_slice(self, wmat, n_experts: int):
        """Slice a (..., E) routing-weight matrix to this shard's experts."""
        if self.ep <= 1:
            return wmat
        e_local = n_experts // self.ep
        eid = lax.axis_index(self.expert_axis)
        return lax.dynamic_slice_in_dim(
            wmat, eid * e_local, e_local, axis=wmat.ndim - 1)


NULL_CTX = SpmdCtx()


def _check(cond: bool, what: str):
    if not cond:
        raise ValueError(
            f"shard_map path requires {what}; pick a different mesh shape "
            f"(see deepseek_tpu.parallel.mesh.default_mesh_shape)")


def make_ctx(cfg: ModelConfig, mesh: Mesh) -> SpmdCtx:
    """Validate mesh/config divisibility and build the body context."""
    tp = mesh.shape.get("tensor", 1)
    ep = mesh.shape.get("expert", 1)
    dp = mesh.shape.get("data", 1)
    sp = mesh.shape.get("seq", 1)
    if sp > 1:
        _check(cfg.kv_window % sp == 0,
               f"kv_window {cfg.kv_window} % seq {sp} == 0")
    if tp > 1:
        _check(cfg.n_heads % tp == 0, f"n_heads {cfg.n_heads} % tensor {tp} == 0")
        _check(cfg.hidden_dim % tp == 0,
               f"hidden_dim {cfg.hidden_dim} % tensor {tp} == 0")
        if cfg.n_shared_experts > 0:
            _check((cfg.n_shared_experts * cfg.moe_intermediate_size) % tp == 0,
                   "shared-expert hidden dim divisible by tensor axis")
    if ep > 1:
        _check(cfg.n_routed_experts % ep == 0,
               f"n_routed_experts {cfg.n_routed_experts} % expert {ep} == 0")
    return SpmdCtx(tp=tp, ep=ep, dp=dp, sp=sp,
                   lm_head_tp=(tp > 1 and cfg.vocab_size % tp == 0),
                   ep_capacity_factor=getattr(cfg, "ep_capacity_factor", 0.0))
