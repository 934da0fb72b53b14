"""Token sampling: argmax, temperature, and proper nucleus (top-p) sampling.

Capability parity with the reference Sampler (/root/reference/src/sampler.cpp):
``temperature == 0`` short-circuits to argmax; ``sample_prob`` returns the
softmax probability of one index (used by perplexity mode). Per SURVEY.md §2
item 16, the reference's top-p loop walks the logits in raw vocab order (a
quirk); we implement the *intended* nucleus sampling — sort descending, cut
the nucleus at cumulative mass ``top_p``, renormalize, sample.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class Sampler:
    def __init__(self, vocab_size: int, seed: Optional[int] = None):
        self.vocab_size = vocab_size
        self.rng = np.random.default_rng(seed)

    @staticmethod
    def _softmax(logits: np.ndarray) -> np.ndarray:
        x = logits.astype(np.float64)
        x = x - x.max()
        e = np.exp(x)
        return e / e.sum()

    def sample_prob(self, index: int, logits: np.ndarray) -> float:
        """softmax(logits)[index] — perplexity scoring (sampler.cpp:12-26)."""
        return float(self._softmax(np.asarray(logits))[index])

    def sample_argmax(self, logits: np.ndarray) -> int:
        return int(np.asarray(logits).argmax())

    def sample(self, logits: np.ndarray, temperature: float = 1.0, top_p: float = 0.95) -> int:
        logits = np.asarray(logits, dtype=np.float32).reshape(-1)
        if temperature == 0.0:
            return self.sample_argmax(logits)
        probs = self._softmax(logits / temperature)
        if top_p < 1.0:
            order = np.argsort(-probs, kind="stable")
            sorted_probs = probs[order]
            cum = np.cumsum(sorted_probs)
            # keep the smallest set whose mass >= top_p (always >= 1 token)
            cutoff = int(np.searchsorted(cum, top_p) + 1)
            nucleus = order[:cutoff]
            nucleus_probs = sorted_probs[:cutoff]
            nucleus_probs = nucleus_probs / nucleus_probs.sum()
            return int(self.rng.choice(nucleus, p=nucleus_probs))
        return int(self.rng.choice(self.vocab_size, p=probs))
