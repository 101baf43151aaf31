"""Deterministic synthetic transcript corpus generator (FIXTURES.md).

Mirrors the reference's fixture structure — AIDA token/annotation records
(reference: src/spel/aida.py:12-46), gold spans (src/spel/utils.py:174-227),
candidate/alias dimensions (src/spel/configuration.py:39-53) — transplanted
to the transcript domain of BASELINE.json's input_hint.

Everything is seeded (`numpy.random.Generator(PCG64(seed))`), no wall clock,
no unseeded RNG: identical `(seed, n_turns)` -> identical bytes.

Mention convention: every entity mention in `text` appears inside double
quotes (`... "Wash. Post" ...`); filler words are lowercase and never
quoted.  This makes mention extraction a deterministic, vectorizable
operation (the Spark-side analogue of SpEL's subword mention detector) while
the *hard* problem — deciding which surfaces corefer — stays with the
blocking/scoring/clustering pipeline.

Corruption model (exercises each normalizer/scorer component, FIXTURES §2):
  easy (normalization recovers the key): display form, lowercase, UPPER,
       slug with underscores, wrapped punctuation, possessive 's;
  hard (needs LSH blocking + fuzzy scoring): edit-distance-1 typo,
       abbreviation (first word + initials), last-token truncation,
       no-space concatenation (recoverable via the redirects dimension).
Hot-key skew: tool-name entities receive ~30% of all mentions, Zipf s=1.2
(FIXTURES: "the designated hot blocking keys for skew tests").
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from spel_spark.functions.normalize import norm_surface_py

EPOCH0 = 1767225600  # 2026-01-01T00:00:00Z, fixed constant (FIXTURES §1)

TOOLS = [
    "search", "bash", "browser", "python", "editor",
    "terminal", "calendar", "email", "files", "maps",
]

_FILLER = (
    "ok so can you please check the and then for me before we continue "
    "next let us look at again also maybe run it now with that from last "
    "time thanks will do here is what found when looking into this"
).split()

_CONS = list("bcdfgklmnprstvz")
_VOW = list("aeiou")


def _word(rng: np.random.Generator, min_syll: int = 2, max_syll: int = 3) -> str:
    n = int(rng.integers(min_syll, max_syll + 1))
    out = []
    for _ in range(n):
        out.append(_CONS[rng.integers(0, len(_CONS))])
        out.append(_VOW[rng.integers(0, len(_VOW))])
        if rng.random() < 0.3:
            out.append(_CONS[rng.integers(0, len(_CONS))])
    return "".join(out)


@dataclass
class Corpus:
    """All generator outputs as pandas DataFrames (Spark-ready)."""

    transcripts: pd.DataFrame
    gold_mentions: pd.DataFrame  # conv_id, turn_idx, begin_char, end_char, surface, entity_id
    labeled_pairs: pd.DataFrame  # a/b (conv,turn,begin) triples + block_key + same_entity
    redirects: pd.DataFrame      # alias_norm, canonical_norm
    entities: pd.DataFrame       # entity_id, canonical
    params: dict = field(default_factory=dict)


def _edit_distance(a: str, b: str) -> int:
    if abs(len(a) - len(b)) > 4:
        return 5  # capped; callers only care about < 5
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _entity_universe(rng: np.random.Generator, n_entities: int):
    """Entities with unique first tokens and a small shared-last-token pool
    (shared last tokens create near-miss negative families, FIXTURES §4).

    Head tokens are kept >= 5 edits apart so one seeded typo per side can
    never bring two entities' surfaces within scorer reach — the fixture must be hard but
    solvable (FIXTURES §2: "F1 >= 0.99 remains reachable")."""
    last_pool = [_word(rng).capitalize() for _ in range(max(4, n_entities // 6))]
    firsts: list[str] = []
    ents = []
    for eid in range(len(TOOLS)):
        ents.append((eid, TOOLS[eid]))  # tool entities: 1-word lowercase canonical
    eid = len(TOOLS)
    while eid < n_entities:
        w = _word(rng).capitalize()
        wl = w.lower()
        if wl in TOOLS or any(_edit_distance(wl, f) < 5 for f in firsts):
            continue
        firsts.append(wl)
        n_extra = 1 if rng.random() < 0.8 else 2
        words = [w] + [last_pool[rng.integers(0, len(last_pool))] for _ in range(n_extra)]
        ents.append((eid, "_".join(words)))
        eid += 1
    return ents


def _typo(s: str, rng: np.random.Generator) -> str:
    if len(s) < 5:
        return s
    pos = int(rng.integers(2, len(s) - 1))
    alpha = "abcdefghijklmnopqrstuvwxyz"
    old = s[pos]
    repl = alpha[rng.integers(0, 26)]
    while repl == old.lower():
        repl = alpha[rng.integers(0, 26)]
    repl = repl.upper() if old.isupper() else repl
    return s[:pos] + repl + s[pos + 1:]


def _corrupt(canonical: str, rng: np.random.Generator, is_tool: bool) -> tuple[str, str]:
    """Return (surface, kind). Display base = underscores->spaces."""
    words = canonical.split("_")
    base = " ".join(words)
    r = rng.random()
    if is_tool:
        # hot keys: short names, keep corruptions normalization-recoverable
        if r < 0.55:
            return base, "exact"
        if r < 0.75:
            return base.upper() if rng.random() < 0.5 else base.capitalize(), "case"
        if r < 0.9:
            return f"`{base}`" if rng.random() < 0.5 else f"{base}!", "punct"
        return base + "'s", "possessive"
    if r < 0.20:
        return base, "exact"
    if r < 0.32:
        return base.lower(), "case"
    if r < 0.40:
        return base.upper(), "case"
    if r < 0.50:
        return canonical, "slug"
    if r < 0.58:
        return f"({base})" if rng.random() < 0.5 else f"{base},", "punct"
    if r < 0.66:
        return base + "'s", "possessive"
    # hard corruptions (~34% of non-tool mentions)
    if r < 0.78:
        return _typo(base, rng), "typo"
    if r < 0.86 and len(words) >= 2:
        return words[0] + " " + " ".join(w[0] + "." for w in words[1:]), "abbrev"
    if r < 0.93 and len(words) >= 2:
        return " ".join(words[:-1]), "truncate"
    if len(words) >= 2:
        return "".join(words), "concat"
    return _typo(base, rng), "typo"


def generate(seed: int = 42, n_turns: int = 2000, n_entities: int = 120) -> Corpus:
    rng = np.random.Generator(np.random.PCG64(seed))
    ents = _entity_universe(rng, n_entities)
    canon = {eid: c for eid, c in ents}

    # Zipf weights: tools get 30% of mention mass (s=1.2 within tools),
    # regular entities share the rest uniformly-ish (mild Zipf).
    tool_ids = np.arange(len(TOOLS))
    tool_w = 1.0 / (tool_ids + 1) ** 1.2
    tool_w = 0.30 * tool_w / tool_w.sum()
    reg_ids = np.arange(len(TOOLS), len(ents))
    reg_w = 1.0 / (np.arange(len(reg_ids)) + 1) ** 0.3
    reg_w = 0.70 * reg_w / reg_w.sum()
    ent_ids = np.concatenate([tool_ids, reg_ids])
    ent_w = np.concatenate([tool_w, reg_w])

    turns_left = n_turns
    t_rows, m_rows = [], []
    conv_seq = 0
    while turns_left > 0:
        conv_len = int(rng.integers(3, 11))
        conv_len = min(conv_len, turns_left)
        conv_id = f"conv-{conv_seq:08d}"
        for turn_idx in range(conv_len):
            role = ["user", "assistant", "tool"][
                int(rng.choice(3, p=[0.4, 0.4, 0.2]))
            ]
            tool = TOOLS[int(rng.choice(len(TOOLS), p=tool_w / tool_w.sum()))] if role == "tool" else None
            n_mentions = 0 if rng.random() < 0.05 else int(rng.integers(1, 5))
            parts, pos = [], 0
            text_chunks = []

            def emit_filler(k):
                nonlocal pos
                chunk = " ".join(
                    _FILLER[rng.integers(0, len(_FILLER))] for _ in range(k)
                )
                text_chunks.append(chunk)
                pos += len(chunk)

            emit_filler(int(rng.integers(2, 5)))
            for _ in range(n_mentions):
                eid = int(ent_ids[rng.choice(len(ent_ids), p=ent_w)])
                surface, _kind = _corrupt(canon[eid], rng, eid < len(TOOLS))
                text_chunks.append(' "')
                pos += 2
                begin = pos
                text_chunks.append(surface)
                pos += len(surface)
                m_rows.append((conv_id, turn_idx, begin, pos, surface, eid))
                text_chunks.append('" ')
                pos += 2
                emit_filler(int(rng.integers(1, 4)))
            text = "".join(text_chunks)
            ts = EPOCH0 + conv_seq * 3600 + turn_idx * 7
            t_rows.append((conv_id, turn_idx, role, text, tool, ts))
        conv_seq += 1
        turns_left -= conv_len

    transcripts = pd.DataFrame(
        t_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    transcripts["ts"] = pd.to_datetime(transcripts["ts"], unit="s")
    gold_mentions = pd.DataFrame(
        m_rows,
        columns=["conv_id", "turn_idx", "begin_char", "end_char", "surface", "entity_id"],
    )

    labeled_pairs = _labeled_pairs(rng, gold_mentions, canon)
    redirects = _redirects(canon)
    entities = pd.DataFrame(ents, columns=["entity_id", "canonical"])
    return Corpus(
        transcripts=transcripts,
        gold_mentions=gold_mentions,
        labeled_pairs=labeled_pairs,
        redirects=redirects,
        entities=entities,
        params={"seed": seed, "n_turns": n_turns, "n_entities": n_entities},
    )


_PAIRS_PER_ENTITY = 60


def _labeled_pairs(rng, gold_mentions: pd.DataFrame, canon: dict[int, str]) -> pd.DataFrame:
    """Positive pairs within entity + near-miss negatives (~3:1), FIXTURES §4."""
    key_cols = ["conv_id", "turn_idx", "begin_char"]
    rows = []
    by_ent = {eid: g[key_cols].to_numpy() for eid, g in gold_mentions.groupby("entity_id")}

    def add(a, b, block_key, same):
        rows.append((*a, *b, block_key, same))

    n_pos = 0
    for eid, arr in sorted(by_ent.items()):
        m = len(arr)
        if m < 2:
            continue
        block_key = norm_surface_py(canon[eid])
        want = min(_PAIRS_PER_ENTITY, m * (m - 1) // 2)
        seen = set()
        tries = 0
        while len(seen) < want and tries < want * 10:
            i, j = rng.integers(0, m), rng.integers(0, m)
            tries += 1
            if i == j:
                continue
            i, j = (i, j) if i < j else (j, i)
            if (i, j) in seen:
                continue
            seen.add((i, j))
            add(tuple(arr[i]), tuple(arr[j]), block_key, True)
            n_pos += 1

    # near-miss negative families: entities sharing their last canonical token
    fam: dict[str, list[int]] = {}
    for eid, c in canon.items():
        last = c.split("_")[-1].lower()
        fam.setdefault(last, []).append(eid)
    neg_target = 3 * n_pos
    fams = [v for v in fam.values() if len(v) >= 2]
    n_neg, guard = 0, 0
    while n_neg < neg_target and guard < neg_target * 20 and fams:
        guard += 1
        f = fams[rng.integers(0, len(fams))]
        e1, e2 = rng.choice(f, size=2, replace=False)
        a1, a2 = by_ent.get(int(e1)), by_ent.get(int(e2))
        if a1 is None or a2 is None or not len(a1) or not len(a2):
            continue
        a = tuple(a1[rng.integers(0, len(a1))])
        b = tuple(a2[rng.integers(0, len(a2))])
        block_key = norm_surface_py(canon[int(e1)].split("_")[-1])
        add(a, b, block_key, False)
        n_neg += 1

    return pd.DataFrame(
        rows,
        columns=[
            "a_conv", "a_turn", "a_begin",
            "b_conv", "b_turn", "b_begin",
            "block_key", "same_entity",
        ],
    )


def _redirects(canon: dict[int, str]) -> pd.DataFrame:
    """Alias dimension: no-space concat alias -> canonical normalized form
    (mirrors aida_canonical_redirects.json, configuration.py:39-53)."""
    rows = []
    for _eid, c in sorted(canon.items()):
        words = c.split("_")
        if len(words) >= 2:
            rows.append((norm_surface_py("".join(words)), norm_surface_py(c)))
    return pd.DataFrame(rows, columns=["alias_norm", "canonical_norm"]).drop_duplicates()
