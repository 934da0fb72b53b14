"""Pure-numpy single-token reference forward pass (golden model).

An independent from-spec implementation of the DeepSeek block semantics
(reference call stack SURVEY.md §3.2) used to validate the jitted TPU model:
float32 throughout, batch 1, explicit ring+sink KV cache. Deliberately
written in a different style (numpy per-step, stateful caches) so that
agreement with the jnp implementation is meaningful.

Gating follows deepseek_tpu's documented semantics (HF-correct group
selection, bias for selection only) — see deepseek_tpu/ops/gating.py.
"""

from __future__ import annotations

import numpy as np

from deepseek_tpu.config import KV_SINKS, ActivationType, ModelConfig, ScoringFunc, TopKMethod


def rmsnorm(x, w, eps):
    return x / np.sqrt((x * x).mean() + eps) * w


def softmax(x):
    e = np.exp(x - x.max())
    return e / e.sum()


def rope(x, pos, theta, is_v3):
    """x: (..., d). Angles in float32 like the C++ reference."""
    d = x.shape[-1]
    i = np.arange(0, d, 2, dtype=np.float32)
    freq = np.float32(theta) ** -(i / np.float32(d))
    val = np.float32(pos) * freq
    c, s = np.cos(val, dtype=np.float32), np.sin(val, dtype=np.float32)
    x0, x1 = x[..., 0::2], x[..., 1::2]
    re = x0 * c - x1 * s
    im = x0 * s + x1 * c
    if is_v3:
        out = np.empty_like(x)
        out[..., 0::2] = re
        out[..., 1::2] = im
        return out
    return np.concatenate([re, im], axis=-1)


def act_fn(x, act: ActivationType):
    if act == ActivationType.SILU:
        return x / (1.0 + np.exp(-x))
    return 0.5 * x * (1.0 + np.tanh(0.797885 * (x + 0.044715 * x ** 3)))


class NumpyRef:
    def __init__(self, cfg: ModelConfig, wd: dict):
        self.cfg = cfg
        self.wd = {k: np.asarray(v, np.float32) for k, v in wd.items()
                   if not k.startswith("tokenizer")}
        c = cfg
        S = c.kv_window
        cdt = np.dtype(c.kv_cache_dtype)  # f16 like the reference's caches
        if c.use_mla:
            self.ckv = np.zeros((c.n_layers, S, c.kv_lora_rank), cdt)
            self.krope = np.zeros((c.n_layers, S, c.qk_rope_head_dim), cdt)
        else:
            self.k = np.zeros((c.n_layers, S, c.n_heads, c.head_dim), cdt)
            self.v = np.zeros((c.n_layers, S, c.n_heads, c.v_head_dim), cdt)

    def _w(self, name):
        return self.wd[name]

    def gate(self, logits):
        c = self.cfg
        if c.scoring_func == ScoringFunc.SOFTMAX:
            scores = softmax(logits)
        else:
            scores = 1.0 / (1.0 + np.exp(-logits))
        bias = self.wd.get(self._gate_bias_name)
        sel = scores + bias if bias is not None else scores.copy()
        k = c.n_active_routed
        if c.topk_method == TopKMethod.GREEDY:
            idx = np.argsort(-sel, kind="stable")[:k]
        else:
            gs = sel.reshape(c.n_group, -1)
            if c.topk_method == TopKMethod.NOAUX_TC:
                group_scores = np.sort(gs, axis=-1)[:, -2:].sum(axis=-1)
            else:
                group_scores = gs.max(axis=-1)
            top_groups = np.argsort(-group_scores, kind="stable")[:c.topk_group]
            mask = np.full_like(sel, -1e30)
            gsize = sel.shape[0] // c.n_group
            for g in top_groups:
                mask[g * gsize:(g + 1) * gsize] = sel[g * gsize:(g + 1) * gsize]
            idx = np.argsort(-mask, kind="stable")[:k]
        w = scores[idx]
        if c.norm_topk_prob:
            w = w / (w.sum() + 1e-20)
        return w * c.routed_scaling_factor, idx

    def forward(self, token: int, pos: int) -> np.ndarray:
        c = self.cfg
        window = c.kv_window
        kv_sink = KV_SINKS if pos >= window else 0
        kv_pos = kv_sink + (pos - kv_sink) % (window - kv_sink)
        kv_len = min(pos + 1, window)
        is_v3 = c.has_moegate_bias
        H, nope, P, Dv, R = (c.n_heads, c.qk_nope_head_dim, c.qk_rope_head_dim,
                             c.v_head_dim, c.kv_lora_rank)

        x = self._w("model.embed.weight")[token].copy()

        for l in range(c.n_layers):
            p = f"model.layers.{l}"
            xb = rmsnorm(x, self._w(f"{p}.attn.norm.weight"), c.norm_eps)

            kv_a = self._w(f"{p}.attn.wkv_a.weight") @ xb
            k_rope = rope(kv_a[R:], pos, c.rope_theta, is_v3)
            ckv = rmsnorm(kv_a[:R], self._w(f"{p}.attn.kv_a_norm.weight"), c.norm_eps)

            if c.use_mla:
                q_a = self._w(f"{p}.attn.wq_a.weight") @ xb
                q_a = rmsnorm(q_a, self._w(f"{p}.attn.q_a_norm.weight"), c.norm_eps)
                q_rope = (self._w(f"{p}.attn.wq_rope_b.weight") @ q_a).reshape(H, P)
                q_rope = rope(q_rope, pos, c.rope_theta, is_v3)
                q_c = (self._w(f"{p}.attn.wc.weight") @ q_a).reshape(H, R)

                self.ckv[l, kv_pos] = ckv
                self.krope[l, kv_pos] = k_rope
                for r in range(kv_sink):
                    self.krope[l, r] = rope(self.krope[l, r], 1, c.rope_theta, is_v3)

                lat = np.zeros((H, R), np.float32)
                for h in range(H):
                    sc = (self.ckv[l, :kv_len] @ q_c[h]
                          + self.krope[l, :kv_len] @ q_rope[h]) / np.sqrt(c.head_dim)
                    w = softmax(sc)
                    lat[h] = w @ self.ckv[l, :kv_len]
                wv_b = self._w(f"{p}.attn.wv_b.weight").reshape(H, Dv, R)
                vh = np.stack([wv_b[h] @ lat[h] for h in range(H)])  # (H, Dv)
                attn = self._w(f"{p}.attn.wo.weight") @ vh.reshape(H * Dv)
            else:
                if c.q_lora_rank > 0:
                    q_a = self._w(f"{p}.attn.wq_a.weight") @ xb
                    q_a = rmsnorm(q_a, self._w(f"{p}.attn.q_a_norm.weight"), c.norm_eps)
                    q = (self._w(f"{p}.attn.wq_b.weight") @ q_a).reshape(H, c.head_dim)
                else:
                    q = (self._w(f"{p}.attn.wq.weight") @ xb).reshape(H, c.head_dim)
                q = q.copy()
                q[:, nope:] = rope(q[:, nope:], pos, c.rope_theta, is_v3)

                kv_b = (self._w(f"{p}.attn.wkv_b.weight") @ ckv).reshape(H, nope + Dv)
                kh = np.concatenate(
                    [kv_b[:, :nope], np.broadcast_to(k_rope, (H, P))], axis=-1)
                self.k[l, kv_pos] = kh
                self.v[l, kv_pos] = kv_b[:, nope:]
                for r in range(kv_sink):
                    self.k[l, r, :, nope:] = rope(
                        self.k[l, r, :, nope:], 1, c.rope_theta, is_v3)

                outs = np.zeros((H, Dv), np.float32)
                for h in range(H):
                    sc = (self.k[l, :kv_len, h] @ q[h]) / np.sqrt(c.head_dim)
                    w = softmax(sc)
                    outs[h] = w @ self.v[l, :kv_len, h]
                attn = self._w(f"{p}.attn.wo.weight") @ outs.reshape(H * Dv)

            x = x + attn
            xb = rmsnorm(x, self._w(f"{p}.mlp.norm.weight"), c.norm_eps)

            if c.is_moe_layer(l):
                self._gate_bias_name = f"{p}.moegate.bias"
                logits = self._w(f"{p}.moegate.weight") @ xb
                weights, idx = self.gate(logits)
                ffn = np.zeros_like(x)
                w1 = self._w(f"{p}.mlp.w1.weight")
                w2 = self._w(f"{p}.mlp.w2.weight")
                w3 = self._w(f"{p}.mlp.w3.weight")
                for wk, e in zip(weights, idx):
                    h = act_fn(w1[e] @ xb, c.act) * (w3[e] @ xb)
                    ffn = ffn + wk * (w2[e] @ h)
                if c.n_shared_experts > 0:
                    h = act_fn(self._w(f"{p}.shared_mlp.w1.weight") @ xb, c.act) \
                        * (self._w(f"{p}.shared_mlp.w3.weight") @ xb)
                    ffn = ffn + self._w(f"{p}.shared_mlp.w2.weight") @ h
            else:
                h = act_fn(self._w(f"{p}.mlp.w1.weight") @ xb, c.act) \
                    * (self._w(f"{p}.mlp.w3.weight") @ xb)
                ffn = self._w(f"{p}.mlp.w2.weight") @ h
            x = x + ffn

        x = rmsnorm(x, self._w("model.norm.weight"), c.norm_eps)
        wcls = self.wd.get("model.output.weight", self.wd["model.embed.weight"])
        return wcls @ x
