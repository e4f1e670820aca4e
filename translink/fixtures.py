"""Deterministic synthetic transcript fixtures (FIXTURES.md).

Planted populations mirroring the reference's test corpora (temp dirs with
known duplicate/unique files, ``tests/pipeline_test.rs:38-119``,
``tests/phase4_test.rs:174-208``, ``src/tests/streaming_test.rs:17-123``):

  1. uniques (~70%)           — globally unique text (unique uid token).
  2. exact duplicates (~15%)  — byte-identical turn sequences, new conv_id,
                                shifted ts; groups of 2-5.
  3. near duplicates (~10%)   — length-preserving token swaps (same blocking
                                key -> labeled), a dropped turn, or
                                punctuation noise; groups of 2-3.
  4. confusables (~4%)        — same blocking key (same turn count, same
                                per-turn lengths) but disjoint vocabulary;
                                must NOT cluster.
  5. edge cases (~1%)         — single-turn, all-empty-text (an exact group
                                by construction), very long text.
  6. hot-key cluster          — `hot_group_size` byte-identical conversations
                                sharing one blocking key, forcing the salted
                                block-size bound (P8).

Everything is seeded; identical inputs produce identical tables. Transcript
rows are emitted in shuffled order so canonicalization's stable turn ordering
is actually exercised.
"""

from __future__ import annotations

import itertools
import random
from datetime import datetime, timedelta

import pandas as pd

#: Deterministic pseudo-word vocabulary (seeded, CV-syllable words), grouped
#: by length so confusables/near-dups can swap words without changing text
#: length (keeps the blocking key equal). A realistic vocabulary size keeps
#: random texts' shingle overlap near zero.
_CONSONANTS = "bcdfghjklmnprstvz"
_VOWELS = "aeiou"


def _make_vocab(n_per_len: int = 60, lengths=(4, 5, 6, 7, 8, 9), seed: int = 1234):
    rng = random.Random(seed)
    out: list[str] = []
    seen = set()
    for length in lengths:
        made = 0
        while made < n_per_len:
            w = "".join(
                rng.choice(_CONSONANTS) + rng.choice(_VOWELS)
                for _ in range((length + 1) // 2)
            )[:length]
            if w not in seen:
                seen.add(w)
                out.append(w)
                made += 1
    return out


VOCAB = _make_vocab()
_BY_LEN: dict[int, list[str]] = {}
for w in VOCAB:
    _BY_LEN.setdefault(len(w), []).append(w)

ROLES = ["user", "assistant"]
TOOLS = ["search", "calc", "fetch"]
BASE_TS = datetime(2026, 1, 1, 0, 0, 0)

PROFILE_SIZES = {"tiny": 160, "small": 4000, "bench": 80000, "bench_xl": 320000}


def _sentence(rng: random.Random, target_len: int) -> str:
    words = []
    n = 0
    while n < target_len:
        w = rng.choice(VOCAB)
        words.append(w)
        n += len(w) + 1
    return " ".join(words)


def _swap_tokens(rng: random.Random, text: str, k: int) -> str:
    """Replace k words with different same-length words (length-preserving)."""
    words = text.split(" ")
    idxs = [i for i in range(len(words)) if len(_BY_LEN.get(len(words[i]), [])) > 1]
    rng.shuffle(idxs)
    for i in idxs[:k]:
        choices = [w for w in _BY_LEN[len(words[i])] if w != words[i]]
        words[i] = rng.choice(choices)
    return " ".join(words)


#: Shadow vocabulary for confusables: same word lengths, zero token overlap
#: with VOCAB (reversed words, rotated on the rare collision with a real
#: vocab word).
def _make_shadow() -> dict[str, str]:
    vocab_set = set(VOCAB)
    shadow = {}
    for w in VOCAB:
        cand = w[::-1]
        while cand in vocab_set or cand == w:
            cand = cand[1:] + cand[0]
        shadow[w] = cand
    return shadow


_SHADOW = _make_shadow()


def _disjoint_same_shape(rng: random.Random, text: str) -> str:
    """Replace EVERY word with its shadow-vocab twin — identical per-turn
    lengths (same blocking key) but disjoint token sets, so the pair shares
    a block yet must score below threshold. Used for confusables."""
    return " ".join(_SHADOW.get(w, w[::-1] or w) for w in text.split(" "))


class _Conv:
    __slots__ = ("conv_id", "turns", "ts_offset_min")

    def __init__(self, conv_id, turns, ts_offset_min):
        self.conv_id = conv_id
        self.turns = turns  # list of (role, text, tool)
        self.ts_offset_min = ts_offset_min


def _base_turns(rng: random.Random, i: int, n_turns: int, unique: bool) -> list:
    turns = []
    for t in range(n_turns):
        role = ROLES[t % 2]
        tool = None
        if rng.random() < 0.10:
            role, tool = "tool", rng.choice(TOOLS)
        target = rng.randint(20, 400)
        text = _sentence(rng, target)
        if unique and t == 0:
            # uid token guarantees global uniqueness of the canonical text
            text = f"uid{i:06d} " + text
        turns.append((role, text, tool))
    return turns


def generate(profile: str = "tiny", seed: int = 42, hot_group_size: int = 50):
    """Build the fixture; returns dict of pandas DataFrames:
    ``transcripts``, ``labeled_pairs``, ``expected_clusters``.

    Block keys in ``labeled_pairs`` use the engine's default attribute key
    (n_turns | total_chars // 16); only pairs sharing it are labeled, per the
    evaluation contract ("labeled pairs at the shared blocking key").
    """
    n_base = PROFILE_SIZES[profile]
    if profile == "tiny":
        hot_group_size = min(hot_group_size, 20)
    rng = random.Random(seed)
    convs: list[_Conv] = []
    groups: list[list[str]] = []   # planted same-entity groups (ids)
    confusable_pairs: list[tuple[str, str]] = []
    # all all-empty-text conversations are byte-identical to each other, so
    # they form ONE global exact group regardless of which index planted them
    empty_ids: list[str] = []

    for i in range(n_base):
        cid = f"conv_{i:06d}"
        r = i % 100
        off = i * 10
        if r < 70:  # unique
            n_turns = max(1, min(64, int(rng.lognormvariate(2.1, 0.6))))
            convs.append(_Conv(cid, _base_turns(rng, i, n_turns, True), off))
        elif r < 85:  # exact-duplicate group
            n_turns = max(2, min(32, int(rng.lognormvariate(2.1, 0.5))))
            turns = _base_turns(rng, i, n_turns, True)
            size = rng.randint(2, 5)
            ids = [cid] + [f"{cid}_dup{k}" for k in range(1, size)]
            for k, gid in enumerate(ids):
                convs.append(_Conv(gid, list(turns), off + k * 1440))
            groups.append(ids)
        elif r < 95:  # near-duplicate group
            n_turns = max(3, min(32, int(rng.lognormvariate(2.1, 0.5))))
            turns = _base_turns(rng, i, n_turns, True)
            size = rng.randint(2, 3)
            ids = [cid]
            convs.append(_Conv(cid, list(turns), off))
            for k in range(1, size):
                ndid = f"{cid}_ndup{k}"
                ids.append(ndid)
                variant = rng.random()
                vturns = list(turns)
                if variant < 0.6:
                    # length-preserving token swaps on 1-2 turns
                    for tidx in rng.sample(range(n_turns), min(2, n_turns)):
                        role, text, tool = vturns[tidx]
                        vturns[tidx] = (role, _swap_tokens(rng, text, rng.randint(1, 3)), tool)
                elif variant < 0.8 and n_turns > 3:
                    # drop one non-first turn (different n_turns -> unlabeled,
                    # still must cluster via LSH)
                    vturns.pop(rng.randrange(1, n_turns))
                else:
                    # punctuation noise on one turn
                    tidx = rng.randrange(n_turns)
                    role, text, tool = vturns[tidx]
                    vturns[tidx] = (role, text + "!", tool)
                convs.append(_Conv(ndid, vturns, off + k * 1440))
            groups.append(ids)
        elif r < 99:  # confusable pair: same shape, disjoint words
            n_turns = max(2, min(16, int(rng.lognormvariate(1.9, 0.4))))
            turns = _base_turns(rng, i, n_turns, False)
            other = [(role, _disjoint_same_shape(rng, text), tool)
                     for role, text, tool in turns]
            cfid = f"{cid}_cf"
            convs.append(_Conv(cid, turns, off))
            convs.append(_Conv(cfid, other, off + 1440))
            confusable_pairs.append((cid, cfid))
        else:  # edge cases, rotating
            kind = (i // 100) % 3
            if kind == 0:  # single turn
                convs.append(_Conv(cid, _base_turns(rng, i, 1, True), off))
            elif kind == 1:  # very long text
                long_text = f"uid{i:06d} " + _sentence(rng, 12_000)
                convs.append(_Conv(cid, [("user", long_text, None)], off))
            else:  # all-empty-text pair — joins the global empty exact group
                eid = f"{cid}_dup1"
                empt = [("user", "", None), ("assistant", "", None)]
                convs.append(_Conv(cid, list(empt), off))
                convs.append(_Conv(eid, list(empt), off + 1440))
                empty_ids.extend([cid, eid])

    if empty_ids:
        groups.append(empty_ids)

    # hot-key skew cluster: byte-identical short conversations
    hot_turns = [("user", "reset the cluster", None),
                 ("assistant", "cluster reset done", None),
                 ("user", "thanks", None)]
    hot_ids = [f"hot_{k:04d}" for k in range(hot_group_size)]
    for k, hid in enumerate(hot_ids):
        convs.append(_Conv(hid, list(hot_turns), 10 * n_base + k))
    groups.append(hot_ids)

    # ---- transcripts table (shuffled row order) -------------------------
    rows = []
    for c in convs:
        t0 = BASE_TS + timedelta(minutes=c.ts_offset_min)
        for idx, (role, text, tool) in enumerate(c.turns):
            rows.append((c.conv_id, idx, role, text, tool, t0 + timedelta(minutes=idx)))
    rng.shuffle(rows)
    transcripts = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")

    # ---- labeled pairs (restricted to shared blocking key) --------------
    def _block_key(c: _Conv) -> str:
        total = sum(len(t[1]) for t in c.turns)
        return f"{len(c.turns)}|{total // 16}"

    keys = {c.conv_id: _block_key(c) for c in convs}
    lp = []
    for g in groups:
        for a, b in itertools.combinations(sorted(g), 2):
            if keys[a] == keys[b]:
                lp.append((a, b, keys[a], True))
    for a, b in confusable_pairs:
        a, b = sorted((a, b))
        if keys[a] == keys[b]:
            lp.append((a, b, keys[a], False))
    labeled_pairs = pd.DataFrame(
        lp, columns=["conv_id_a", "conv_id_b", "block_key", "is_match"]
    )

    # ---- expected clusters ----------------------------------------------
    cluster_of = {}
    for g in groups:
        root = min(g)
        for gid in g:
            cluster_of[gid] = root
    ec = [(c.conv_id, cluster_of.get(c.conv_id, c.conv_id)) for c in convs]
    expected_clusters = pd.DataFrame(ec, columns=["conv_id", "cluster_id"])

    return {
        "transcripts": transcripts,
        "labeled_pairs": labeled_pairs,
        "expected_clusters": expected_clusters,
    }


def to_spark(spark, pdf: pd.DataFrame, schema: str | None = None):
    """pandas -> Spark with the canonical transcript schema when applicable."""
    if schema is None and set(pdf.columns) == {
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    }:
        schema = (
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        pdf = pdf[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    return spark.createDataFrame(pdf, schema=schema)
