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


def nucleus_probs(logits: np.ndarray, temperature: float, top_p: float
                  ) -> np.ndarray:
    """The ONE host-side nucleus distribution, tie-handling identical to the
    on-device sampler (ops/sampling.py): the keep set is {p >= p_cut} where
    p_cut is the smallest probability inside the minimal prefix whose mass
    reaches top_p — boundary ties are all kept, exactly like the device's
    binary-searched threshold. temperature <= 0 -> one-hot argmax.

    Used by Sampler.sample and by the speculative acceptance rule, so the
    decode_block>1 (device) and decode_block=1 (host) paths sample from the
    same distribution.
    """
    logits = np.asarray(logits, dtype=np.float32).reshape(-1)
    if temperature <= 0:
        p = np.zeros(logits.shape[-1], np.float64)
        p[int(np.argmax(logits))] = 1.0
        return p
    z = logits.astype(np.float64) / max(temperature, 1e-6)
    z -= z.max()
    p = np.exp(z)
    p /= p.sum()
    if top_p < 1.0:
        sorted_probs = np.sort(p)[::-1]
        cum = np.cumsum(sorted_probs)
        cutoff = int(np.searchsorted(cum, top_p) + 1)
        p_cut = sorted_probs[min(cutoff, len(sorted_probs)) - 1]
        p = np.where(p >= p_cut, p, 0.0)
        p /= p.sum()
    return p


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
        probs = nucleus_probs(logits, temperature, top_p)
        return int(self.rng.choice(len(probs), p=probs))
