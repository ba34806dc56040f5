"""Deterministic synthetic transcript tables (FIXTURES.md T1, input_hint shape).

Columns: conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[µs]. Seeded numpy only — no wall-clock, no Spark.

Distributions are chosen so every codec has a column where it wins
(FIXTURES.md): conv_id sorted ⇒ RLE; turn_idx small-range ⇒ FOR; role
4-category ⇒ dict; text phrase-repetitive ⇒ FSST; tool 70%-null 12-category
⇒ dict+null bitmap; ts monotone-per-conversation µs ⇒ delta/FOR.
Skew knob: 3 conversations own ~10% of all turns (exercises salting).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.array(["user", "assistant", "system", "tool"], dtype=object)
ROLE_W = np.array([0.40, 0.40, 0.05, 0.15])
TOOLS = np.array(
    ["bash", "read", "write", "grep", "edit", "glob", "web", "sql",
     "python", "diff", "test", "deploy"],
    dtype=object,
)
_EPOCH_2026_01_01_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in µs


def _vocab(rng: np.random.Generator, n_words: int = 2000) -> np.ndarray:
    base = [
        "the", "a", "to", "of", "and", "in", "is", "it", "you", "that", "was",
        "for", "on", "are", "with", "as", "this", "have", "from", "or", "one",
        "had", "by", "word", "but", "not", "what", "all", "were", "we", "when",
        "your", "can", "said", "there", "use", "each", "which", "she", "do",
        "how", "their", "if", "will", "up", "other", "about", "out", "many",
        "then", "them", "these", "so", "some", "her", "would", "make", "like",
        "him", "into", "time", "has", "look", "two", "more", "write", "go",
        "see", "number", "no", "way", "could", "people", "my", "than", "first",
        "water", "been", "call", "who", "oil", "its", "now", "find", "long",
        "down", "day", "did", "get", "come", "made", "may", "part", "error",
        "file", "function", "test", "return", "value", "spark", "data",
        "column", "table", "query", "run", "code", "fix", "read", "json",
    ]
    extra = [f"tok{i:04d}" for i in range(n_words - len(base))]
    return np.array(base + extra, dtype=object)


def _phrases(rng: np.random.Generator, vocab: np.ndarray, n: int = 400) -> list[bytes]:
    """Repeated n-gram phrases (3-8 words) — the FSST fodder."""
    out = []
    for _ in range(n):
        k = int(rng.integers(3, 9))
        idx = rng.zipf(1.4, size=k) % len(vocab)
        out.append(b" ".join(w.encode() for w in vocab[idx]))
    return out


def gen_transcripts(n_turns: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    phrases = np.array(_phrases(rng, vocab), dtype=object)

    # --- conversation sizes: 3 hot convs own ~10% of turns; rest ~geometric(20)
    hot_turns = n_turns // 10
    rest = n_turns - hot_turns
    sizes = [max(1, hot_turns // 3)] * 3
    total = sum(sizes)
    while total < n_turns:
        # draw geometric sizes in batches (a scalar-draw loop with a running
        # python sum was the O(n^2) bottleneck at sf >= 1)
        batch = np.minimum(
            rng.geometric(1 / 20.0, size=max((n_turns - total) // 20, 1024)), 400
        )
        keep = np.searchsorted(np.cumsum(batch), n_turns - total) + 1
        batch = batch[:keep]
        sizes.extend(int(x) for x in batch)
        total += int(batch.sum())
    sizes = np.array(sizes, dtype=np.int64)
    overflow = int(sizes.sum() - n_turns)
    if overflow:
        sizes[-1] -= overflow
        sizes = sizes[sizes > 0]
    n_conv = len(sizes)

    conv_ids = np.array([f"conv-{i:08d}".encode() for i in range(n_conv)], dtype=object)
    conv_col = np.repeat(conv_ids, sizes)
    turn_idx = np.concatenate([np.arange(s, dtype=np.int32) for s in sizes])
    n = len(conv_col)

    role = rng.choice(ROLES, size=n, p=ROLE_W)

    # --- text: 4-20 phrases per turn (≈300 chars mean), ~1% empty, ~0.5% null
    k_phr = rng.integers(4, 21, size=n)
    flat = rng.integers(0, len(phrases), size=int(k_phr.sum()))
    bounds = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(k_phr, out=bounds[1:])
    text = np.empty(n, dtype=object)
    ph = phrases  # local alias
    for i in range(n):
        text[i] = b" ".join(ph[j] for j in flat[bounds[i] : bounds[i + 1]])
    u = rng.random(n)
    text[u < 0.010] = b""
    text_mask = u > 0.995  # null mask (~0.5%)

    tool = np.empty(n, dtype=object)
    tool_vals = rng.choice(TOOLS, size=n)
    tool[:] = tool_vals
    tool_mask = rng.random(n) < 0.70  # 70% null

    # --- ts: conv start uniform over 30 days from 2026-01-01; +1-120s per turn
    starts = rng.integers(0, 30 * 86400, size=n_conv).astype(np.int64) * 1_000_000
    incs = rng.integers(1, 121, size=n).astype(np.int64) * 1_000_000
    conv_of_row = np.repeat(np.arange(n_conv), sizes)
    cum = np.cumsum(incs)
    first_row = np.zeros(n_conv, dtype=np.int64)
    first_row[1:] = np.cumsum(sizes)[:-1]
    # per-conversation cumulative offsets (vectorized segmented cumsum)
    seg_base = cum[first_row] - incs[first_row]
    ts = _EPOCH_2026_01_01_US + starts[conv_of_row] + (cum - seg_base[conv_of_row])

    # text can exceed 2 GiB total at sf >= 2.0 — build with 64-bit offsets and
    # only narrow to string when it fits (parquet stores BYTE_ARRAY either way,
    # and sort_by's concatenation would overflow 32-bit offsets otherwise)
    text_arr = pa.array(text, type=pa.large_binary(), mask=text_mask)
    text_type = pa.string() if text_arr.nbytes < 2**31 - 2**20 else pa.large_string()
    tbl = pa.table(
        {
            "conv_id": pa.array(conv_col, type=pa.binary()).cast(pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.binary()).cast(pa.string()),
            "text": text_arr.cast(pa.large_string()).cast(text_type),
            "tool": pa.array(tool, type=pa.binary(), mask=tool_mask).cast(pa.string()),
            "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
        }
    )
    # ingest order = global event-time order (conversations interleaved), so the
    # encode pipeline's repartition+sort is doing real work
    return tbl.sort_by("ts")


def write_transcripts(
    out_dir: str, sf: float, seed: int = 42, row_group_rows: int = 8192
) -> str:
    """Generate-and-cache transcripts at scale factor sf (sf=0.001 ≈ 6k turns).

    Small row groups (default 8k rows) keep the single cached file splittable
    so a local[N] scan parallelizes — stand-in for the many-file layout a
    real 100 TB table has. Returns the parquet path; regenerates only if
    missing.
    """
    n_turns = max(int(6_000_000 * sf), 100)
    path = os.path.join(
        out_dir, f"transcripts_sf{sf}_seed{seed}_rg{row_group_rows}.parquet"
    )
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    tbl = gen_transcripts(n_turns, seed)
    pq.write_table(tbl, path, compression="snappy", row_group_size=row_group_rows)
    return path
