"""Inference engine: the reference ``Session`` (main.cpp:71-83) as a class
owning checkpoint data, config, params, tokenizer, sampler, and a cache of
jitted forward functions.

Hydration strategy (TPU-first): the reference forwards prompts strictly one
token at a time (README.md:94). Here prompts are hydrated with chunked causal
prefill on the MXU while positions fit inside the KV window, falling back to
ring-buffer decode steps beyond it — identical results (tests prove
prefill == stepwise decode), order-of-magnitude faster hydration.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepseek_tpu.config import ModelConfig
from deepseek_tpu.models import init_cache, make_forward
from deepseek_tpu.models.deepseek import make_decode_loop
from deepseek_tpu.models.loader import load_params, params_active_bytes
from deepseek_tpu.sampler import Sampler, nucleus_probs as _nucleus_probs
from deepseek_tpu.tokenizer import Tokenizer
from deepseek_tpu.utils.codec import load_checkpoint
from deepseek_tpu.utils.profiling import profile_scope


@dataclass
class GenerationStats:
    prompt_tokens: int = 0
    generated_tokens: int = 0
    hydrate_s: float = 0.0
    generate_s: float = 0.0
    active_bytes_per_token: float = 0.0
    # speculative decoding telemetry
    spec_rounds: int = 0
    spec_drafted: int = 0
    spec_accepted: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.spec_accepted / self.spec_drafted if self.spec_drafted else 0.0

    @property
    def tok_per_s(self) -> float:
        return self.generated_tokens / self.generate_s if self.generate_s > 0 else 0.0

    @property
    def gb_per_s(self) -> float:
        if self.generate_s <= 0:
            return 0.0
        return self.active_bytes_per_token * self.generated_tokens / self.generate_s / 1e9



def _accept_drafts(lg_all: "np.ndarray", drafts: list, qdists: list,
                   temperature: float, top_p: float, rng) -> tuple:
    """Speculative acceptance (arXiv 2211.17192 Alg. 1): returns
    (n_accepted, replacement | None). lg_all rows verify drafts[i]; the
    caller samples the bonus from lg_all[len(drafts)] on full acceptance."""
    k = len(drafts)
    for i in range(k):
        p = _nucleus_probs(lg_all[i], temperature, top_p)
        q = qdists[i]
        d = drafts[i]
        if temperature <= 0:
            if int(np.argmax(p)) == d:
                continue
            return i, int(np.argmax(p))
        if rng.random() < min(1.0, p[d] / max(q[d], 1e-12)):
            continue
        res = np.maximum(p - q, 0.0)
        res = res / res.sum() if res.sum() > 0 else p
        return i, int(rng.choice(len(res), p=res))
    return k, None


class Engine:
    def __init__(
        self,
        checkpoint_dir: str,
        *,
        context: int = 0,
        lock_weights: bool = False,
        compute_dtype: Optional[str] = None,
        runtime_dtype: Optional[str] = None,
        kv_cache_dtype: Optional[str] = None,
        seed: Optional[int] = None,
        prefill_chunk: int = 256,
        decode_block: int = 32,
        use_yarn: bool = False,
        load_mtp: bool = True,
        kquant_runtime: Optional[str] = None,
        fuse: bool = True,
        scan_layers="auto",
    ):
        self.data = load_checkpoint(checkpoint_dir)
        overrides = {}
        if compute_dtype:
            overrides["compute_dtype"] = compute_dtype
        if kv_cache_dtype:
            overrides["kv_cache_dtype"] = kv_cache_dtype
        elif jax.default_backend() == "tpu":
            # the TPU has no native f16 (Mosaic rejects it); bf16 is the
            # hardware half dtype — same cache bytes as the reference's f16
            overrides["kv_cache_dtype"] = "bfloat16"
        if use_yarn:
            overrides["use_yarn"] = True
        self.cfg = ModelConfig.from_metadata(self.data.metadata, context=context, **overrides)
        # `-L` parity (MAP_POPULATE + mlock, codec.cpp:276-289): device_put
        # already copies each tensor device-resident; with -L we additionally
        # force synchronous materialization so no transfer is lazy.
        self.lock_weights = lock_weights
        self.params = load_params(self.data, self.cfg,
                                  runtime_dtype=runtime_dtype,
                                  load_mtp=load_mtp,
                                  kquant_runtime=kquant_runtime)
        if fuse:
            # fuse same-activation projection pairs into single sweeps
            # (~4 fewer dispatches per layer per token); sharded paths
            # unfuse automatically (parallel.sharding.shard_params).
            # consume=True keeps peak HBM ~one layer above the fused size.
            # fuse_projections also stride-16 row-permutes fused expert
            # [w1;w3] nibble tables (loader._rowperm_layer): h then leaves
            # the w13 matmul already in the activation order the w2 kernel
            # wants, enabling the single-dispatch fused expert FFN kernel
            # (qmm_expert_ffn). Sharded paths unfuse (and un-permute).
            from deepseek_tpu.models.loader import fuse_projections
            p, self.params = self.params, None
            self.params = fuse_projections(p, self.cfg, consume=True)
            del p
        # roll homogeneous layer runs into lax.scan stacks: compiled
        # program size stays depth-independent (unrolled stacks cross a
        # TPU program-size cliff past ~24 layers — PERFORMANCE.md) and
        # compile time drops. "auto" engages for deep models; the Engine
        # is single-chip, so the stacked layout is always legal here.
        # EXCEPT nibble runtime: scan+nibble at full depth OOMs on the
        # chip at the first decode dispatch (persists even with params
        # pre-aligned to the loop's compiled layouts — PERFORMANCE.md),
        # and unrolled nibble is the fastest deep config anyway, so
        # "auto" leaves nibble models unrolled. scan_layers=True still
        # forces stacking for users who want to try it.
        if scan_layers is True or (scan_layers == "auto"
                                   and self.cfg.n_layers >= 16
                                   and kquant_runtime != "nibble"):
            from deepseek_tpu.models.loader import stack_layer_groups
            p, self.params = self.params, None
            self.params = stack_layer_groups(
                p, self.cfg, consume=True,
                min_group=2 if scan_layers is True else 8)
            del p
        if lock_weights:
            jax.block_until_ready(jax.tree.leaves(self.params))
        self.tokenizer = Tokenizer.from_checkpoint(self.data)
        self.sampler = Sampler(self.cfg.vocab_size, seed)
        self.prefill_chunk = max(1, prefill_chunk)
        # tokens sampled on device per decode dispatch (1 = step-per-token)
        self.decode_block = max(1, decode_block)
        from deepseek_tpu.models.params import StackedLayers
        if (self.decode_block > 1
                and any(isinstance(e, StackedLayers)
                        for e in self.params.layers)):
            # deep scanned models: pre-relayout params to the decode
            # loop's compiled input formats — XLA's auto layouts want
            # transposed tilings for some stacked scale planes, and the
            # per-dispatch relayout copies tax every step (loader
            # docstring has the numbers; NOTE this does NOT fix the
            # scan+nibble full-depth OOM — that path stays gated off in
            # "auto" above)
            from deepseek_tpu.models.loader import align_param_layouts
            p, self.params = self.params, None
            try:
                # perf hygiene only — if the aval-lowered probe compile
                # fails (or the compiled input_formats API shifts), run
                # with default layouts instead of failing the load.
                # align_param_layouts absorbs mid-tree donation failures
                # itself (returning the merged live tree); it re-raises
                # only when (a) nothing was moved yet (probe/compile
                # errors) or (b) a leaf lost BOTH copies — in that case
                # p shares the deleted leaf and must not be restored.
                self.params = align_param_layouts(p, self.cfg,
                                                  n_steps=self.decode_block)
            except Exception:  # noqa: BLE001
                if any(getattr(leaf, "is_deleted", lambda: False)()
                       for leaf in jax.tree.leaves(p)):
                    raise  # a param leaf is irrecoverably gone
                import logging
                logging.getLogger("deepseek_tpu.engine").warning(
                    "param layout alignment failed; decode dispatches "
                    "may pay relayout copies", exc_info=True)
                self.params = p
            del p
        self._key = jax.random.PRNGKey(seed if seed is not None else 0)
        self._fns = {}

    # ------------------------------------------------------------------
    def fwd(self, prefill: bool, logits_mode: str):
        key = (prefill, logits_mode)
        if key not in self._fns:
            self._fns[key] = make_forward(
                self.cfg, prefill=prefill, logits_mode=logits_mode)
        return self._fns[key]

    def decode_loop(self, n_steps: int):
        key = ("loop", n_steps)
        if key not in self._fns:
            self._fns[key] = make_decode_loop(self.cfg, n_steps)
        return self._fns[key]

    def new_cache(self, batch: int = 1):
        return init_cache(self.cfg, batch=batch)

    def active_bytes(self, pos: int = 0) -> float:
        return params_active_bytes(self.params, self.cfg, pos)

    def bits_per_weight(self) -> float:
        """Measured storage bits/weight of the loaded projection tensors
        (stat-line parity with the reference's bits_per_weight,
        codec.cpp:40-66; storage truth, runtime layout included)."""
        from deepseek_tpu.models.loader import params_bits_per_weight
        return params_bits_per_weight(self.params)

    # ------------------------------------------------------------------
    @property
    def chat_template(self) -> Optional[str]:
        """The checkpoint's HF chat template (converter embeds it in the
        .dseek metadata), or None for pre-chat checkpoints."""
        return self.data.metadata.get("chat_template")

    def render_chat(self, messages, add_generation_prompt: bool = True,
                    template: Optional[str] = None) -> str:
        """messages [{"role", "content"}, ...] -> prompt string via the
        checkpoint's chat template (deepseek_tpu.chat.render_chat)."""
        from deepseek_tpu.chat import ChatTemplateError, render_chat
        tpl = template or self.chat_template
        if not tpl:
            raise ChatTemplateError(
                "checkpoint has no chat_template metadata (re-convert from "
                "an HF dir whose tokenizer_config.json carries one, or pass "
                "a template explicitly)")
        md = self.data.metadata
        return render_chat(
            tpl, messages,
            bos_token=md.get("chat_bos_token", ""),
            eos_token=md.get("chat_eos_token", ""),
            add_generation_prompt=add_generation_prompt)

    # ------------------------------------------------------------------
    # session persistence (beyond the reference: SURVEY §5 notes it has no
    # KV-cache/session persistence — hydrating a long prompt is repaid on
    # every restart). A session = the KV cache pytree + the next decode
    # position, stored in the same safetensors wire format as checkpoints.
    _SESSION_FPR_KEYS = ("n_layers", "kv_window", "use_mla", "n_heads",
                         "kv_lora_rank", "qk_rope_head_dim",
                         "qk_nope_head_dim", "v_head_dim", "kv_cache_dtype")

    def _session_fingerprint(self) -> dict:
        c = self.cfg
        vals = dict(n_layers=c.n_layers, kv_window=c.kv_window,
                    use_mla=int(c.use_mla), n_heads=c.n_heads,
                    kv_lora_rank=c.kv_lora_rank,
                    qk_rope_head_dim=c.qk_rope_head_dim,
                    qk_nope_head_dim=c.qk_nope_head_dim,
                    v_head_dim=c.v_head_dim,
                    kv_cache_dtype=str(c.kv_cache_dtype))
        return {k: str(v) for k, v in vals.items()}

    def save_session(self, path: str, cache, pos: int,
                     tokens: Optional[List[int]] = None) -> None:
        """Persist a hydrated session: the KV cache + next decode position
        (and optionally the token history, for display/replay). One
        safetensors-format file; resume with load_session on an engine
        over the same checkpoint."""
        import dataclasses as _dc
        from deepseek_tpu.utils.codec import save_shard
        tensors = {}
        for f in _dc.fields(type(cache)):
            v = getattr(cache, f.name)
            if v is not None:
                tensors[f"session.cache.{f.name}"] = np.asarray(v)
        if tokens is not None:
            tensors["session.tokens"] = np.asarray(tokens, np.int32)
        md = {"session.pos": str(int(pos)), **{
            f"session.cfg.{k}": v
            for k, v in self._session_fingerprint().items()}}
        save_shard(path, tensors, metadata=md)

    def load_session(self, path: str):
        """Restore (cache, pos, tokens|None) saved by save_session.
        Fails loudly when the session was hydrated under an incompatible
        config (different depth/window/attention geometry/cache dtype)."""
        from deepseek_tpu.models.kvcache import KVCache
        from deepseek_tpu.utils.codec import load_shard
        md, tensors = load_shard(path, read_metadata=True)
        want = self._session_fingerprint()
        got = {k.split(".", 2)[2]: v for k, v in md.items()
               if k.startswith("session.cfg.")}
        if got != want:
            diff = {k: (got.get(k), want[k]) for k in want
                    if got.get(k) != want[k]}
            raise ValueError(
                f"session {path} was saved under an incompatible config: "
                f"{diff} (saved, engine)")
        kw = {}
        for name, tv in tensors.items():
            if name.startswith("session.cache."):
                kw[name.split(".", 2)[2]] = jnp.asarray(np.asarray(tv.array))
        cache = KVCache(**{f: kw.get(f) for f in (
            "k", "v", "ckv", "krope", "k_s", "v_s", "ckv_s", "krope_s",
            "sink_krope", "sink_k")})
        toks = (np.asarray(tensors["session.tokens"].array).tolist()
                if "session.tokens" in tensors else None)
        return cache, int(md["session.pos"]), toks

    # ------------------------------------------------------------------
    def _target_logprobs(self, logits, targets, r: int) -> np.ndarray:
        """Gather log_softmax(logits)[i, targets[i]] on device; only the (r,)
        scored rows cross the (slow) host link, never the (r, V) matrix."""
        key = "ppl_gather"
        if key not in self._fns:
            def g(lg, tg):
                lsm = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
                return jnp.take_along_axis(lsm, tg[:, None], axis=-1)[:, 0]
            self._fns[key] = jax.jit(g)
        out = self._fns[key](logits, jnp.asarray(targets, jnp.int32))
        return np.asarray(out[:r])

    def hydrate(self, cache, tokens: List[int], pos0: int = 0,
                want_last_logits: bool = True,
                collect_all_logits: bool = False,
                progress: Optional[Callable[[int, int], None]] = None,
                target_tokens: Optional[List[int]] = None):
        """Feed ``tokens`` at positions pos0.. into the cache.

        Returns (cache, last_logits | None, collected | None, end_pos).
        ``collect_all_logits`` returns per-position log-softmax rows (N, V);
        ``target_tokens`` (len N, entry i scored against the logits after
        feeding tokens[i]; the final entry may be a dummy) instead gathers
        only the per-position target logprobs (N,) ON DEVICE — the full
        (N, V) matrix never crosses the host link (perplexity mode).
        """
        cfg = self.cfg
        window = cfg.kv_window
        C = self.prefill_chunk
        N = len(tokens)
        last_logits = None
        collect = collect_all_logits or target_tokens is not None
        chunk_logits: List[np.ndarray] = []  # per-chunk (r, V) lsm or (r,) lp

        def collect_rows(out_rows, i: int, r: int):
            """out_rows: (T, V) logits for rows i..i+r-1 (T >= r)."""
            if target_tokens is not None:
                T = out_rows.shape[0]
                tg = list(target_tokens[i:i + r]) + [0] * (T - r)
                chunk_logits.append(self._target_logprobs(out_rows, tg, r))
            else:
                lsm = jax.nn.log_softmax(out_rows[:r], axis=-1)
                chunk_logits.append(np.asarray(lsm))

        i = 0
        while i < N:
            pos = pos0 + i
            n_left = N - i
            if pos < window:
                # chunk clamped to the window edge (min(C, window-pos)) so a
                # prompt ending near the edge still prefills instead of
                # degrading to one-token decode dispatches
                cp = min(C, window - pos)
                r = min(cp, n_left)
                chunk = list(tokens[i:i + r]) + [0] * (cp - r)
                is_last = i + r == N
                need_last = is_last and want_last_logits
                mode = "all" if (collect or (need_last and r < cp)) else (
                    "last" if need_last else "none")
                with profile_scope("hydrate.prefill"):
                    out, cache = self.fwd(True, mode)(
                        self.params, cache, jnp.asarray([chunk], jnp.int32),
                        pos)
                if mode == "all":
                    if collect:
                        collect_rows(out[0], i, r)
                    if need_last:
                        last_logits = np.asarray(out[0, r - 1])
                elif mode == "last":
                    last_logits = np.asarray(out[0])
                i += r
            else:
                tok = tokens[i]
                is_last = i + 1 == N
                mode = "all" if collect else (
                    "last" if (is_last and want_last_logits) else "none")
                if mode == "all":
                    out, cache = self.fwd(False, "last")(
                        self.params, cache, jnp.asarray([[tok]], jnp.int32), pos)
                    collect_rows(out, i, 1)
                    if is_last and want_last_logits:
                        last_logits = np.asarray(out[0])
                else:
                    out, cache = self.fwd(False, mode)(
                        self.params, cache, jnp.asarray([[tok]], jnp.int32), pos)
                    if mode == "last":
                        last_logits = np.asarray(out[0])
                i += 1
            if progress is not None:
                progress(i, N)

        all_lsm = np.concatenate(chunk_logits, axis=0) if chunk_logits else None
        return cache, last_logits, all_lsm, pos0 + N

    # ------------------------------------------------------------------
    def generate(
        self,
        prompt_tokens: List[int],
        num_steps: int = 256,
        temperature: float = 1.0,
        top_p: float = 0.95,
        on_token: Optional[Callable[[int, bytes], None]] = None,
        top_k: int = 0,
        min_p: float = 0.0,
    ) -> Tuple[List[int], GenerationStats]:
        """Completion loop (run_completion, main.cpp:277-361).

        num_steps: 0 = up to max_seq_len, -1 = until eos. top_k/min_p are
        additional sampling filters beyond the reference surface
        (sampler.nucleus_probs composition); 0 disables them.
        """
        cfg = self.cfg
        stats = GenerationStats(prompt_tokens=len(prompt_tokens))
        cache = self.new_cache()

        t0 = time.perf_counter()
        cache, logits, _, pos = self.hydrate(cache, prompt_tokens, 0)
        stats.hydrate_s = time.perf_counter() - t0

        if num_steps == 0:
            max_new = cfg.max_seq_len - len(prompt_tokens)
        elif num_steps < 0:
            max_new = 1 << 62
        else:
            max_new = num_steps

        out_tokens: List[int] = []
        prev = prompt_tokens[-1] if prompt_tokens else self.tokenizer.bos_id

        def emit(token: int) -> bool:
            nonlocal prev
            out_tokens.append(token)
            if on_token is not None:
                on_token(token, self.tokenizer.decode_one(prev, token))
            prev = token
            return self.tokenizer.is_eos_or_eot(token)

        t0 = time.perf_counter()
        # first token comes from the hydrate logits (host-side sample)
        token = self.sampler.sample(logits, temperature, top_p, top_k, min_p)
        stopped = emit(token)

        if self.decode_block > 1:
            # fused on-device rollout: one dispatch per decode_block tokens
            loop = self.decode_loop(self.decode_block)
            while not stopped and len(out_tokens) < max_new:
                self._key, sub = jax.random.split(self._key)
                with profile_scope("generate.decode_block"):
                    toks_dev, _, cache = loop(
                        self.params, cache, jnp.asarray([[token]], jnp.int32),
                        pos, sub, jnp.float32(temperature),
                        jnp.float32(top_p), top_k=jnp.float32(top_k),
                        min_p=jnp.float32(min_p))
                    block = np.asarray(toks_dev[0]).tolist()
                pos += len(block)
                token = block[-1]
                for t in block:
                    stopped = emit(t)
                    if stopped or len(out_tokens) >= max_new:
                        stopped = True
                        break
        else:
            # reference-shaped one-token-per-forward loop
            step_fn = self.fwd(False, "last")
            while not stopped and len(out_tokens) < max_new:
                with profile_scope("generate.step"):
                    logits_dev, cache = step_fn(
                        self.params, cache, jnp.asarray([[token]], jnp.int32),
                        pos)
                    logits = np.asarray(logits_dev[0])
                pos += 1
                with profile_scope("generate.sample"):
                    token = self.sampler.sample(logits, temperature, top_p,
                                                top_k, min_p)
                stopped = emit(token)
        stats.generate_s = time.perf_counter() - t0
        stats.generated_tokens = len(out_tokens)
        stats.active_bytes_per_token = self.active_bytes(pos)
        return out_tokens, stats

    # ------------------------------------------------------------------
    def generate_speculative(
        self,
        prompt_tokens: List[int],
        draft: "Engine",
        num_steps: int = 256,
        temperature: float = 0.0,
        top_p: float = 0.95,
        spec_k: int = 4,
        on_token: Optional[Callable[[int, bytes], None]] = None,
    ) -> Tuple[List[int], GenerationStats]:
        """Speculative decoding with a smaller draft model (beyond the
        reference, which has no speculation of any kind).

        The draft proposes ``spec_k`` tokens per round; one chunked target
        forward scores them all, and the standard acceptance rule keeps the
        output distribution EXACTLY the target model's (greedy outputs are
        token-for-token identical to ``generate``; sampled outputs follow
        speculative sampling, arXiv 2211.17192). Rejected drafts need no
        cache rollback: a ring slot is rewritten whenever its position is
        actually fed, and ``kv_len`` masking never exposes a slot before
        that.

        The draft must share the tokenizer/vocab. Rounds fall back to plain
        decode once positions leave the prefill window.
        """
        assert draft.cfg.vocab_size == self.cfg.vocab_size, \
            "draft and target must share the vocabulary"
        cfg = self.cfg
        stats = GenerationStats(prompt_tokens=len(prompt_tokens))
        try:
            kd = np.asarray(jax.random.key_data(self._key))
        except Exception:
            kd = np.asarray(self._key)
        rng = np.random.default_rng(int(kd.ravel()[-1]))

        t0 = time.perf_counter()
        cache, logits, _, pos = self.hydrate(cache := self.new_cache(),
                                             prompt_tokens, 0)
        dcache, dlogits, _, dpos = draft.hydrate(draft.new_cache(),
                                                 prompt_tokens, 0)
        stats.hydrate_s = time.perf_counter() - t0

        max_new = (cfg.max_seq_len - len(prompt_tokens)) if num_steps == 0 \
            else (1 << 62) if num_steps < 0 else num_steps

        out_tokens: List[int] = []
        prev = prompt_tokens[-1] if prompt_tokens else self.tokenizer.bos_id

        def emit(token: int) -> bool:
            nonlocal prev
            out_tokens.append(token)
            if on_token is not None:
                on_token(token, self.tokenizer.decode_one(prev, token))
            prev = token
            return self.tokenizer.is_eos_or_eot(token)

        def probs_of(lg: np.ndarray) -> np.ndarray:
            return _nucleus_probs(lg, temperature, top_p)

        t0 = time.perf_counter()
        token = self.sampler.sample(logits, temperature, top_p)
        stopped = emit(token)
        dstep = draft.fwd(False, "last")
        window = min(cfg.kv_window, draft.cfg.kv_window)

        # fused stage: R complete speculation rounds per dispatch (draft-k,
        # verify, acceptance all on device — deepseek_tpu.speculative); the
        # stepwise loop below handles the window boundary and the tail
        R = 4
        fused = None
        while (not stopped and len(out_tokens) < max_new and spec_k >= 1
               and pos + R * (spec_k + 1) <= window):
            if fused is None:
                from deepseek_tpu.speculative import make_spec_rounds
                greedy = temperature <= 0
                # key includes the draft ENGINE identity: a different draft
                # means a different ModelConfig baked into the fused fn
                # (the value keeps the draft alive so id() stays unique)
                key = ("spec_rounds", id(draft), spec_k, R, greedy)
                if key not in self._fns:
                    self._fns[key] = (make_spec_rounds(
                        self.cfg, draft.cfg, spec_k, R, greedy=greedy), draft)
                fused = self._fns[key][0]
            self._key, sub = jax.random.split(self._key)
            drafts_r, nacc_r, next_r, cache, dcache = fused(
                self.params, draft.params, cache, dcache,
                jnp.asarray([[token]], jnp.int32), pos, sub,
                jnp.float32(temperature), jnp.float32(top_p))
            drafts_r = np.asarray(drafts_r)
            nacc_r = np.asarray(nacc_r)
            next_r = np.asarray(next_r)
            for r in range(R):
                na = int(nacc_r[r])
                stats.spec_rounds += 1
                stats.spec_drafted += spec_k
                stats.spec_accepted += na
                for d in drafts_r[r, :na]:
                    stopped = emit(int(d))
                    if stopped or len(out_tokens) >= max_new:
                        break
                if stopped or len(out_tokens) >= max_new:
                    break
                token = int(next_r[r])
                pos += na + 1
                stopped = emit(token)
                if stopped or len(out_tokens) >= max_new:
                    break

        while not stopped and len(out_tokens) < max_new:
            k = min(spec_k, max_new - len(out_tokens))
            if pos + k + 1 > window or k < 1:
                # past the prefill window: plain decode step (both caches
                # advance in lockstep)
                lg, cache = self.fwd(False, "last")(
                    self.params, cache,
                    jnp.asarray([[token]], jnp.int32), pos)
                _, dcache = dstep(draft.params, dcache,
                                  jnp.asarray([[token]], jnp.int32), pos)
                pos += 1
                token = self.sampler.sample(np.asarray(lg[0]),
                                            temperature, top_p)
                stopped = emit(token)
                continue

            # 1. draft proposes k tokens (greedy/sampled from its own dist);
            #    drafts[i] is the candidate for sequence position pos+1+i
            drafts, qdists = [], []
            dtok = token
            for i in range(k):
                lg, dcache = dstep(draft.params, dcache,
                                   jnp.asarray([[dtok]], jnp.int32), pos + i)
                q = probs_of(np.asarray(lg[0]))
                dtok = int(rng.choice(len(q), p=q)) if temperature > 0 \
                    else int(np.argmax(q))
                drafts.append(dtok)
                qdists.append(q)

            # 2. one target forward scores all k drafts AND yields the
            #    bonus distribution after the last one (chunk length k+1)
            chunk = [token] + drafts
            lg_all, cache = self.fwd(True, "all")(
                self.params, cache,
                jnp.asarray([chunk], jnp.int32), pos)
            lg_all = np.asarray(lg_all[0])                   # (k+1, V)

            # 3. acceptance (output follows the target distribution exactly)
            n_acc, replacement = _accept_drafts(
                lg_all, drafts, qdists, temperature, top_p, rng)
            stats.spec_rounds += 1
            stats.spec_drafted += k
            stats.spec_accepted += n_acc

            for d in drafts[:n_acc]:
                stopped = emit(d)
                if stopped:
                    break
            if stopped:
                break
            if replacement is not None:
                token = replacement
            else:
                # all k accepted: bonus token from the post-draft dist. The
                # draft cache is missing position pos+k (it generated
                # drafts[-1] but never fed it) — feed it before moving on.
                _, dcache = dstep(draft.params, dcache,
                                  jnp.asarray([[drafts[-1]]], jnp.int32),
                                  pos + k)
                token = int(rng.choice(
                    len(qdists[0]), p=probs_of(lg_all[k]))) \
                    if temperature > 0 else int(np.argmax(lg_all[k]))
            pos += n_acc + 1
            if len(out_tokens) >= max_new:
                break
            stopped = emit(token)

        stats.generate_s = time.perf_counter() - t0
        stats.generated_tokens = len(out_tokens)
        stats.active_bytes_per_token = self.active_bytes(pos)
        return out_tokens, stats

    # ------------------------------------------------------------------
    def generate_ngram(
        self,
        prompt_tokens: List[int],
        num_steps: int = 256,
        temperature: float = 0.0,
        top_p: float = 0.95,
        spec_k: int = 8,
        ngram_max: int = 3,
        on_token: Optional[Callable[[int, bytes], None]] = None,
    ) -> Tuple[List[int], GenerationStats]:
        """Prompt-lookup speculative decoding: the drafter is a longest-
        suffix n-gram match against the sequence's own history — no draft
        model, no extra weights streamed (beyond the reference AND beyond
        generate_speculative's requirement of a second checkpoint).

        A round proposes the ``spec_k`` tokens that followed the most
        recent earlier occurrence of the last ``ngram_max``..1 tokens and
        verifies them with one (k+1)-token target chunk; acceptance is the
        exact lossless rule (greedy outputs are token-identical to
        ``generate``). Strong on context-echoing workloads (summarization,
        RAG, code edit); when acceptances dry up (two consecutive all-miss
        dispatches) the loop switches to plain fused decode with an
        exponential-backoff re-probe, so novel text pays ~no verify-chunk
        overhead while late-onset repetition is still caught.
        """
        cfg = self.cfg
        stats = GenerationStats(prompt_tokens=len(prompt_tokens))

        t0 = time.perf_counter()
        cache, logits, _, pos = self.hydrate(cache := self.new_cache(),
                                             prompt_tokens, 0)
        stats.hydrate_s = time.perf_counter() - t0

        max_new = (cfg.max_seq_len - len(prompt_tokens)) if num_steps == 0 \
            else (1 << 62) if num_steps < 0 else num_steps
        out_tokens: List[int] = []
        prev = prompt_tokens[-1] if prompt_tokens else self.tokenizer.bos_id

        def emit(token: int) -> bool:
            nonlocal prev
            out_tokens.append(token)
            if on_token is not None:
                on_token(token, self.tokenizer.decode_one(prev, token))
            prev = token
            return self.tokenizer.is_eos_or_eot(token)

        t0 = time.perf_counter()
        token = self.sampler.sample(logits, temperature, top_p)
        stopped = emit(token)
        window = cfg.kv_window

        # device-side history buffer (prompt + emitted, including the
        # token about to be fed); fused rounds only run inside the window
        # so H = window always bounds it
        H = window
        fused = None
        hist = hlen = None
        R = 4
        dry_dispatches = 0
        backoff_blocks = 4             # plain decode blocks per dry phase
        # acceptance EMA: all-miss dispatches are not the only losing
        # regime — SUB-BREAKEVEN acceptance (alpha below ~0.15-0.35
        # depending on depth) keeps paying verify-chunk overhead without
        # ever going fully dry (measured on chip, round 5: a 0.127-alpha
        # workload ran at 0.75x plain under the all-miss-only rule). Two
        # dispatches of EMA below the floor enter the same backoff.
        ALPHA_FLOOR = 0.15
        alpha_ema = None
        plain_block = self.decode_block if self.decode_block > 1 else 8
        plain = None

        def run_plain_block() -> None:
            """One fused plain-decode dispatch (generate's block shape)."""
            nonlocal cache, token, pos, stopped, plain
            if plain is None:
                plain = self.decode_loop(plain_block)
            self._key, sub = jax.random.split(self._key)
            toks_dev, _, cache = plain(
                self.params, cache, jnp.asarray([[token]], jnp.int32),
                pos, sub, jnp.float32(temperature), jnp.float32(top_p))
            block = np.asarray(toks_dev[0]).tolist()
            pos += len(block)
            token = block[-1]
            for t in block:
                stopped = emit(t)
                if stopped or len(out_tokens) >= max_new:
                    stopped = True
                    break

        while (not stopped and len(out_tokens) < max_new and spec_k >= 1
               and len(prompt_tokens) + 1 < H
               and pos + R * (spec_k + 1) < window):
            if dry_dispatches >= 2:
                # dry phase: plain fused decode, probing speculation again
                # after an exponentially growing number of blocks (a probe
                # dispatch costs ~R verify chunks; backoff bounds its
                # amortized overhead on never-repetitive text)
                for _ in range(backoff_blocks):
                    if (stopped or len(out_tokens) >= max_new
                            or pos + R * (spec_k + 1) >= window):
                        break
                    run_plain_block()
                backoff_blocks = min(backoff_blocks * 2, 64)
                hist = None            # stale after plain decode; rebuilt
                dry_dispatches = 1     # one more all-miss -> dry again
                alpha_ema = None       # fresh probe: re-measure acceptance
                continue
            if fused is None:
                from deepseek_tpu.speculative import make_ngram_spec_rounds
                greedy = temperature <= 0
                key = ("ngram_rounds", spec_k, R, ngram_max, greedy)
                if key not in self._fns:
                    self._fns[key] = make_ngram_spec_rounds(
                        cfg, spec_k, R, hist_len=H, ngram_max=ngram_max,
                        greedy=greedy)
                fused = self._fns[key]
            if hist is None:
                seq = prompt_tokens + out_tokens   # len == pos + 1 <= H
                # build host-side: a device .at[:len].set compiles one XLA
                # program PER DISTINCT LENGTH (~1 s each on a remote-
                # attached chip — measured round 5, bench_ngram_real)
                buf = np.zeros((1, H), np.int32)
                buf[0, :len(seq)] = seq
                hist = jnp.asarray(buf)
                hlen = jnp.int32(len(seq))
            self._key, sub = jax.random.split(self._key)
            drafts_r, nacc_r, next_r, match_r, cache, hist, hlen = fused(
                self.params, cache, hist, hlen,
                jnp.asarray([[token]], jnp.int32), pos, sub,
                jnp.float32(temperature), jnp.float32(top_p))
            drafts_r = np.asarray(drafts_r)
            nacc_r = np.asarray(nacc_r)
            next_r = np.asarray(next_r)
            accepted_this = 0
            for r in range(R):
                na = int(nacc_r[r])
                stats.spec_rounds += 1
                stats.spec_drafted += spec_k
                stats.spec_accepted += na
                accepted_this += na
                for d in drafts_r[r, :na]:
                    stopped = emit(int(d))
                    if stopped or len(out_tokens) >= max_new:
                        break
                if stopped or len(out_tokens) >= max_new:
                    break
                token = int(next_r[r])
                pos += na + 1
                stopped = emit(token)
                if stopped or len(out_tokens) >= max_new:
                    break
            disp_alpha = accepted_this / (R * spec_k)
            alpha_ema = disp_alpha if alpha_ema is None \
                else 0.6 * alpha_ema + 0.4 * disp_alpha
            if accepted_this == 0 or alpha_ema < ALPHA_FLOOR:
                dry_dispatches += 1
            else:
                dry_dispatches = 0
                backoff_blocks = 4

        # tail (window edge onward): plain fused block decode
        while not stopped and len(out_tokens) < max_new:
            run_plain_block()

        stats.generate_s = time.perf_counter() - t0
        stats.generated_tokens = len(out_tokens)
        stats.active_bytes_per_token = self.active_bytes(pos)
        return out_tokens, stats

    # ------------------------------------------------------------------
    def generate_mtp(
        self,
        prompt_tokens: List[int],
        num_steps: int = 256,
        temperature: float = 0.0,
        top_p: float = 0.95,
        spec_k: int = 2,
        on_token: Optional[Callable[[int, bytes], None]] = None,
    ) -> Tuple[List[int], GenerationStats]:
        """Self-speculative decoding with the checkpoint's own MTP module
        (DeepSeek-V3's multi-token-prediction layer — weights the reference
        drops). Same lossless acceptance rule as generate_speculative; the
        MTP drafter chains its own hidden state for k > 1 (EAGLE-style), and
        after every verify round its KV cache is re-hydrated from the main
        model's TRUE hidden states so drafting quality does not drift.

        MTP cache slot j holds the pair (token_{j+1}, hidden_j). Falls back
        to plain generate() when the prompt+generation cannot stay inside
        the prefill window.
        """
        from deepseek_tpu.models.mtp import init_mtp_cache, make_mtp_forward

        assert self.params.mtp is not None, "checkpoint has no MTP module"
        cfg = self.cfg
        window = cfg.kv_window
        N = len(prompt_tokens)
        max_new = (cfg.max_seq_len - N) if num_steps == 0 \
            else (1 << 62) if num_steps < 0 else num_steps
        if N + spec_k + 2 > window:
            return self.generate(prompt_tokens, num_steps, temperature,
                                 top_p, on_token)

        stats = GenerationStats(prompt_tokens=N)
        try:
            kd = np.asarray(jax.random.key_data(self._key))
        except Exception:
            kd = np.asarray(self._key)
        rng = np.random.default_rng(int(kd.ravel()[-1]))

        def fns(key, builder):
            if key not in self._fns:
                self._fns[key] = builder()
            return self._fns[key]

        fwd_h = fns(("hid", True, "all"), lambda: make_forward(
            cfg, prefill=True, logits_mode="all", with_hidden=True))
        fwd_h_none = fns(("hid", True, "none"), lambda: make_forward(
            cfg, prefill=True, logits_mode="none", with_hidden=True))
        mtp_pre = fns(("mtp", True), lambda: make_mtp_forward(
            cfg, prefill=True))
        mtp_step = fns(("mtp", False), lambda: make_mtp_forward(
            cfg, prefill=False))

        # --- hydrate main cache, collecting hidden states per position ---
        t0 = time.perf_counter()
        cache = self.new_cache()
        mtp_cache = init_mtp_cache(cfg)
        C = self.prefill_chunk
        h_rows: List[np.ndarray] = []
        logits = None
        i = 0
        while i < N:
            # padded chunk must stay inside the ring window (the DUS would
            # otherwise clamp and corrupt earlier slots)
            cp = min(C, window - i)
            r = min(cp, N - i)
            chunk = list(prompt_tokens[i:i + r]) + [0] * (cp - r)
            last = i + r == N
            # full-vocab logits only for the final chunk
            fn = fwd_h if last else fwd_h_none
            lg, hid, cache = fn(self.params, cache,
                                jnp.asarray([chunk], jnp.int32), i)
            h_rows.append(np.asarray(hid[0, :r]))
            if last:
                logits = np.asarray(lg[0, r - 1])
            i += r
        h_prompt = np.concatenate(h_rows)                     # (N, dim)
        stats.hydrate_s = time.perf_counter() - t0

        out_tokens: List[int] = []
        prev = prompt_tokens[-1] if prompt_tokens else self.tokenizer.bos_id

        def emit(token: int) -> bool:
            nonlocal prev
            out_tokens.append(token)
            if on_token is not None:
                on_token(token, self.tokenizer.decode_one(prev, token))
            prev = token
            return self.tokenizer.is_eos_or_eot(token)

        def probs_of(lg: np.ndarray) -> np.ndarray:
            return _nucleus_probs(lg, temperature, top_p)

        t0 = time.perf_counter()
        token = self.sampler.sample(logits, temperature, top_p)
        stopped = emit(token)

        # MTP pairs for the prompt: slot j = (prompt[j+1], h_j), j<N-1,
        # plus slot N-1 = (first generated token, h_{N-1})
        pair_toks = list(prompt_tokens[1:]) + [token]
        _, _, mtp_cache = mtp_pre(
            self.params, mtp_cache, jnp.asarray([pair_toks], jnp.int32),
            jnp.asarray(h_prompt[None], jnp.float32), 0)

        pos = N
        h_cur = jnp.asarray(h_prompt[None, -1:], jnp.float32)  # (1,1,dim)
        step_fn = self.fwd(False, "last")
        mtp_live = True  # once the window fallback starts, h_cur and the
        # MTP cache go stale — never re-enter drafting

        # fused stage: R complete MTP speculation rounds per dispatch
        # (deepseek_tpu.speculative); the stepwise loop below handles the
        # window boundary and the tail
        R = 4
        fused = None
        while (not stopped and len(out_tokens) < max_new and spec_k >= 1
               and pos + R * (spec_k + 1) <= window):
            if fused is None:
                from deepseek_tpu.speculative import make_mtp_spec_rounds
                greedy = temperature <= 0
                fused = fns(("mtp_rounds", spec_k, R, greedy),
                            lambda: make_mtp_spec_rounds(
                                cfg, spec_k, R, greedy=greedy))
            self._key, sub = jax.random.split(self._key)
            drafts_r, nacc_r, next_r, h_cur, cache, mtp_cache = fused(
                self.params, cache, mtp_cache,
                jnp.asarray([[token]], jnp.int32), h_cur, pos, sub,
                jnp.float32(temperature), jnp.float32(top_p))
            drafts_r = np.asarray(drafts_r)
            nacc_r = np.asarray(nacc_r)
            next_r = np.asarray(next_r)
            for r in range(R):
                na = int(nacc_r[r])
                stats.spec_rounds += 1
                stats.spec_drafted += spec_k
                stats.spec_accepted += na
                for d in drafts_r[r, :na]:
                    stopped = emit(int(d))
                    if stopped or len(out_tokens) >= max_new:
                        break
                if stopped or len(out_tokens) >= max_new:
                    break
                token = int(next_r[r])
                pos += na + 1
                stopped = emit(token)
                if stopped or len(out_tokens) >= max_new:
                    break

        while not stopped and len(out_tokens) < max_new:
            k = min(spec_k, max_new - len(out_tokens))
            if pos + k + 1 > window or k < 1 or not mtp_live:
                mtp_live = False
                lg, cache = step_fn(self.params, cache,
                                    jnp.asarray([[token]], jnp.int32), pos)
                pos += 1
                token = self.sampler.sample(np.asarray(lg[0]),
                                            temperature, top_p)
                stopped = emit(token)
                continue

            # 1. MTP drafts k tokens, chaining its own hidden state
            drafts, qdists = [], []
            dtok, hh = token, h_cur
            for j in range(k):
                lg_d, hh, mtp_cache = mtp_step(
                    self.params, mtp_cache,
                    jnp.asarray([[dtok]], jnp.int32), hh,
                    pos - 1 + j)
                q = probs_of(np.asarray(lg_d[0, 0]))
                dtok = int(rng.choice(len(q), p=q)) if temperature > 0 \
                    else int(np.argmax(q))
                drafts.append(dtok)
                qdists.append(q)

            # 2. one target forward scores drafts + bonus, with hiddens
            chunk = [token] + drafts
            lg_all, h_all, cache = fwd_h(
                self.params, cache, jnp.asarray([chunk], jnp.int32), pos)
            lg_np = np.asarray(lg_all[0])                    # (k+1, V)

            # 3. lossless acceptance
            n_acc, replacement = _accept_drafts(
                lg_np, drafts, qdists, temperature, top_p, rng)
            stats.spec_rounds += 1
            stats.spec_drafted += k
            stats.spec_accepted += n_acc

            for d in drafts[:n_acc]:
                stopped = emit(d)
                if stopped:
                    break
            if stopped:
                break
            if replacement is not None:
                token = replacement
            else:
                token = int(rng.choice(
                    len(qdists[0]), p=probs_of(lg_np[k]))) \
                    if temperature > 0 else int(np.argmax(lg_np[k]))

            # 4. re-hydrate the MTP cache from TRUE hiddens: slots pos..pos+k
            #    hold pairs (chunk[j+1], h_all[j]); garbage past n_acc is
            #    rewritten by the next round before it is ever attended
            pair_toks = drafts + [token]                     # (k+1,)
            _, _, mtp_cache = mtp_pre(
                self.params, mtp_cache,
                jnp.asarray([pair_toks], jnp.int32), h_all, pos)

            h_cur = h_all[:, n_acc:n_acc + 1]
            pos += n_acc + 1
            if len(out_tokens) >= max_new:
                break
            stopped = emit(token)

        stats.generate_s = time.perf_counter() - t0
        stats.generated_tokens = len(out_tokens)
        stats.active_bytes_per_token = self.active_bytes(pos)
        return out_tokens, stats

    # ------------------------------------------------------------------
    def perplexity(self, tokens: List[int],
                   progress: Optional[Callable[[int, int], None]] = None):
        """ppl over tokens[1:] given prefixes (run_perplexity, main.cpp:371-431).

        Returns (ppl, stderr, n_scored). Matches the reference estimator:
        ppl = exp(-sum/N), err = ppl * sqrt((ss - sum^2/N) / N^2).
        """
        N = len(tokens)
        assert N >= 2, "perplexity needs at least 2 tokens"
        cache = self.new_cache()
        # target for the logits after tokens[i] is tokens[i+1]; the final row
        # (nothing follows) gets a dummy target and is dropped below
        cache, _, logprobs, _ = self.hydrate(
            cache, tokens, 0, want_last_logits=False, progress=progress,
            target_tokens=list(tokens[1:]) + [0])
        logprobs = logprobs[:N - 1]
        n = N - 1
        s = float(-logprobs.sum())
        ss = float((logprobs ** 2).sum())
        ppl = float(np.exp(s / n))
        err = ppl * float(np.sqrt(max(ss - s * s / n, 0.0) / n / n))
        return ppl, err, n
