"""Text-analysis operators for training-data pipelines (build brief):
language-ID heuristic, quality scoring, token counting, rolling-hash
fingerprinting. All vectorized/pandas per batch; stateful pieces (regex
compile, ngram profiles) initialize once per actor."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")

# tiny per-language character/bigram profiles for the heuristic scorer
_LANG_PROFILES = {
    "en": ("the and of to in is that it was for", "th he an in er"),
    "de": ("der die und in den von zu das mit sich", "en er ch de ei"),
    "fr": ("le de un et la les des en du que", "es le de en re"),
    "es": ("el la de que y en un ser se no", "de la en el es"),
    "zh": ("", ""),  # CJK detected by codepoint range instead
}

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been has have had it "
    "that this for on with as at by from".split())


class LangId:
    """N-gram/stopword language scorer (actor-pool stage: profiles and
    regexes built once in __init__)."""

    def __init__(self):
        self.profiles = {}
        for lang, (words, bigrams) in _LANG_PROFILES.items():
            self.profiles[lang] = (frozenset(words.split()),
                                   frozenset(bigrams.split()))
        self.word_re = re.compile(r"[a-zA-Z]+")

    def classify(self, text: str) -> str:
        if any("一" <= c <= "鿿" for c in text[:200]):
            return "zh"
        toks = self.word_re.findall(text.lower())[:200]
        if not toks:
            return "und"
        best, best_score = "und", 0.0
        for lang, (words, bigrams) in self.profiles.items():
            if not words:
                continue
            score = sum(1.0 for t in toks if t in words)
            bg = {t[i:i + 2] for t in toks for i in range(len(t) - 1)}
            score += 0.3 * len(bg & bigrams)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["pred_lang"] = [self.classify(t) for t in batch["text"]]
        return batch


def quality_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized quality metrics: word count, mean word length,
    stopword ratio, punctuation ratio."""
    texts = batch.column(text_col).to_pylist()
    n_words = np.zeros(len(texts), dtype=np.int64)
    mean_wl = np.zeros(len(texts))
    stop_r = np.zeros(len(texts))
    punct_r = np.zeros(len(texts))
    for i, t in enumerate(texts):
        words = t.split()
        n_words[i] = len(words)
        if words:
            mean_wl[i] = sum(len(w) for w in words) / len(words)
            stop_r[i] = sum(1 for w in words if w.lower() in _STOPWORDS) / len(words)
        if t:
            punct_r[i] = sum(1 for c in t if not c.isalnum() and not c.isspace()) / len(t)
    batch = batch.append_column("n_words", pa.array(n_words))
    batch = batch.append_column("mean_word_len", pa.array(mean_wl))
    batch = batch.append_column("stopword_ratio", pa.array(stop_r))
    return batch.append_column("punct_ratio", pa.array(punct_r))


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace + BPE-ish regex token counts (oracle: DuckDB
    regexp_extract_all length on the same pattern)."""
    texts = batch.column(text_col).to_pylist()
    ws = np.fromiter((len(t.split()) for t in texts), dtype=np.int64,
                     count=len(texts))
    rx = np.fromiter((len(_WORD_RE.findall(t)) for t in texts),
                     dtype=np.int64, count=len(texts))
    batch = batch.append_column("n_tokens_ws", pa.array(ws))
    return batch.append_column("n_tokens_re", pa.array(rx))


def rolling_fingerprint(batch: pa.Table, text_col: str = "text",
                        window: int = 16, keep: int = 4) -> pa.Table:
    """Winnowing-style document fingerprint: min-k of Karp-Rabin rolling
    hashes over ``window``-byte windows (deterministic, mergeable)."""
    B = np.uint64(1000003)
    texts = batch.column(text_col).to_pylist()
    fps = []
    for t in texts:
        data = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8)
        if len(data) < window:
            h = np.uint64(0)
            for b in data.astype(np.uint64):
                h = h * B + b
            fps.append([int(h)] * keep)
            continue
        dd = data.astype(np.uint64)
        # hash_i = sum_j d[i+j] * B^(window-1-j) mod 2^64 — computed as
        # `window` shifted vector multiply-adds instead of a per-byte
        # Python rolling loop (identical wraparound arithmetic)
        weights = B ** np.arange(window - 1, -1, -1, dtype=np.uint64)
        n = len(dd) - window + 1
        hashes = np.zeros(n, dtype=np.uint64)
        for j in range(window):
            hashes += dd[j:j + n] * weights[j]
        sel = np.sort(np.unique(hashes))[:keep]
        out = list(int(v) for v in sel)
        out += [0] * (keep - len(out))
        fps.append(out)
    return batch.append_column(
        "fingerprint", pa.array(fps, pa.list_(pa.uint64())))
