"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY §5: golden e2e + inline unit tests, no property testing).

The crown piece: compact_changes + ParquetTable.merge_apply must be
semantically equivalent to a row-at-a-time sequential apply (the reference's
serial sinker IS the spec — rdb_merger.rs folds are an optimization that must
never change the final state). Random event streams exercise NULL keys,
key-changing updates, replays of the same key, and delete/insert interleaving
in combinations no hand-written fixture enumerates.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ape_dts_spark.model.position import GtidSet, _coalesce
from ape_dts_spark.plans.fk_order import fk_levels

# ---------------------------------------------------------------------------
# GtidSet algebra
# ---------------------------------------------------------------------------

intervals = st.lists(
    st.tuples(st.integers(1, 60), st.integers(0, 8)).map(lambda t: (t[0], t[0] + t[1])),
    min_size=0,
    max_size=6,
)
gtids = st.fixed_dictionaries({}, optional={"s1": intervals, "s2": intervals}).map(
    lambda d: GtidSet({u: _coalesce(list(iv)) for u, iv in d.items() if iv})
)


@given(gtids, gtids)
def test_gtid_union_is_superset(a, b):
    u = a.union(b)
    assert u.contains(a) and u.contains(b)


@given(gtids, gtids)
def test_gtid_union_commutes(a, b):
    assert a.union(b).to_text() == b.union(a).to_text()


@given(gtids)
def test_gtid_text_round_trip(a):
    txt = a.to_text()
    assert GtidSet.parse(txt).to_text() == txt if txt else a.intervals == {}


@given(intervals)
def test_coalesce_idempotent_and_ordered(iv):
    c = _coalesce(list(iv))
    assert _coalesce(list(c)) == c
    # disjoint, non-adjacent, sorted
    assert all(b1 + 1 < a2 for (_, b1), (a2, _) in zip(c, c[1:]))


# ---------------------------------------------------------------------------
# FK levels on random DAGs
# ---------------------------------------------------------------------------


@given(
    st.integers(2, 8).flatmap(
        lambda n: st.lists(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)).filter(
                lambda e: e[0] > e[1]  # child id > parent id => acyclic by construction
            ),
            max_size=12,
        ).map(lambda edges: (n, edges))
    )
)
def test_fk_levels_respect_every_edge(case):
    n, raw = case
    tables = [f"t{i}" for i in range(n)]
    edges = [(f"t{c}", f"t{p}") for c, p in raw]
    levels, cyclic = fk_levels(tables, edges)
    assert cyclic == []
    for child, parent in edges:
        assert levels[child] > levels[parent]
    assert set(levels) == set(tables)


# ---------------------------------------------------------------------------
# compact + merge_apply == sequential row-at-a-time apply
# ---------------------------------------------------------------------------

# events over a tiny key space maximize collisions (replays, delete-then-
# insert, key-changing updates, NULL keys)
event_strategy = st.lists(
    st.tuples(
        st.sampled_from(["insert", "update", "delete"]),
        st.one_of(st.none(), st.integers(0, 3)),  # before key
        st.one_of(st.none(), st.integers(0, 3)),  # after key
        st.integers(0, 99),  # value
    ),
    min_size=1,
    max_size=12,
)


def _keyed(events):
    """replay_to_state's contract: every event carries non-NULL keys (the
    NULL-key whole-row path is the serial spill, tested in test_streaming)."""
    out = []
    for op, bk, ak, val in events:
        if op == "insert" and ak is not None:
            out.append((op, bk, ak, val))
        elif op == "delete" and bk is not None:
            out.append((op, bk, ak, val))
        elif op == "update" and bk is not None and ak is not None:
            out.append((op, bk, ak, val))
    return out


def _sequential_apply(events):
    """The spec: row-at-a-time apply in seq order (reference serial sinker).
    update = delete(before-key) + insert(after-key) — key-change aware."""
    state: dict[int, int] = {}
    for op, bk, ak, val in events:
        if op == "insert":
            state[ak] = val
        elif op == "delete":
            state.pop(bk, None)
        else:
            state.pop(bk, None)
            state[ak] = val
    return state


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_strategy)
def test_compact_apply_equals_sequential(spark, events):
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from ape_dts_spark.operators.merge import compact_changes, replay_to_state

    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("val", T.LongType())]
    )
    schema = T.StructType(
        [
            T.StructField("schema", T.StringType()),
            T.StructField("tb", T.StringType()),
            T.StructField("row_type", T.StringType()),
            T.StructField("before", payload),
            T.StructField("after", payload),
            T.StructField("seq", T.LongType()),
        ]
    )
    keyed = _keyed(events)
    if not keyed:
        return
    rows = []
    for seq, (op, bk, ak, val) in enumerate(keyed):
        before = {"id": bk, "val": val - 1} if op != "insert" else None
        after = {"id": ak, "val": val} if op != "delete" else None
        rows.append(("db", "t", op, before, after, seq))
    df = spark.createDataFrame(rows, schema)
    got = {r["id"]: r["val"] for r in replay_to_state(df, ["id"]).collect()}
    want = _sequential_apply(keyed)
    assert got == want


# -- RDB codec round-trip (sources/redis_rdb.py) ----------------------------

_rdb_text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    min_size=0, max_size=80,
)
_rdb_key = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    min_size=1, max_size=40,
)


@st.composite
def _rdb_keyspaces(draw):
    """A small keyspace: per key one entry family with 1..6 members."""
    entries = []
    n_keys = draw(st.integers(1, 6))
    keys = draw(
        st.lists(_rdb_key, min_size=n_keys, max_size=n_keys, unique=True)
    )
    for key in keys:
        etype = draw(st.sampled_from(["string", "hash", "list", "zset", "set"]))
        exp = draw(st.one_of(st.none(), st.integers(0, 2**48)))
        if etype == "string":
            entries.append(
                {"db_id": 0, "key": key, "entry_type": "string", "member": None,
                 "value": draw(_rdb_text), "ord": 0, "expire_ms": exp}
            )
            continue
        n = draw(st.integers(1, 6))
        members = draw(st.lists(_rdb_key, min_size=n, max_size=n, unique=True))
        for i, m in enumerate(members):
            entries.append(
                {"db_id": 0, "key": key, "entry_type": etype,
                 "member": None if etype == "list" else m,
                 "value": None if etype == "set" else (draw(_rdb_text) if etype != "list" else m),
                 "ord": i if etype == "list" else 0, "expire_ms": exp}
            )
    return entries


@given(_rdb_keyspaces())
@settings(max_examples=60, deadline=None)
def test_rdb_codec_round_trips_any_keyspace(entries):
    """encode_rdb -> parse_rdb_bytes is lossless over arbitrary utf-8
    keyspaces for every entry family and every compact-encoding branch the
    writer picks (int forms, ziplist/listpack/intset/quicklist2 thresholds,
    expiries)."""
    from ape_dts_spark.sources import redis_rdb as rdb

    def keyset(rows):
        return sorted(
            (e["db_id"], e["key"], e["entry_type"], e["member"], e["value"], e["ord"],
             e["expire_ms"])
            for e in rows
        )

    parsed = rdb.parse_rdb_bytes(rdb.encode_rdb(entries))
    assert keyset(parsed) == keyset(entries)


# ---------------------------------------------------------------------------
# Temporal joins: asof_join / interval_join vs brute force
# ---------------------------------------------------------------------------

temporal_case = st.fixed_dictionaries(
    {
        "probe": st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 40)), min_size=1, max_size=14
        ),
        "build": st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 40)), min_size=0, max_size=14
        ),
    }
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(temporal_case)
def test_asof_join_equals_brute_force(spark, case):
    """For every probe row, the matched build row must be the one with the
    greatest ts <= probe ts for that key (ids break build-ts ties upstream —
    the strategy de-dups (key, ts) like the operator contract requires)."""
    from ape_dts_spark.operators.asof import asof_join

    build = {}  # (k, t) -> bid, last wins = max id per (k, ts)
    for i, (k, t) in enumerate(case["build"]):
        build[(k, t)] = 100 + i
    probe = [(k, t, i) for i, (k, t) in enumerate(case["probe"])]
    pdf = spark.createDataFrame(probe, "k long, t long, pid long")
    bdf = spark.createDataFrame(
        [(k, t, b) for (k, t), b in build.items()], "k long, t long, bid long"
    )
    got = {r["pid"]: r["bid"] for r in
           asof_join(pdf, bdf, ["k"], "t", ["pid"], ["bid"]).collect()}
    for k, t, pid in probe:
        cands = [(bt, b) for (bk, bt), b in build.items() if bk == k and bt <= t]
        want = max(cands)[1] if cands else None
        assert got[pid] == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(temporal_case)
def test_interval_join_equals_brute_force(spark, case):
    """[start, end) containment against every bucket width."""
    from ape_dts_spark.operators.asof import interval_join

    pts = [(k, t, i) for i, (k, t) in enumerate(case["probe"])]
    ivs = [(k, s, s + (i % 7), 100 + i) for i, (k, s) in enumerate(case["build"])]
    pdf = spark.createDataFrame(pts, "k long, t long, pid long")
    idf = spark.createDataFrame(ivs, "k long, s long, e long, iid long")
    for bucket in (1, 3, 64):
        got = {(r["pid"], r["iid"]) for r in
               interval_join(pdf, idf, ["k"], "t", "s", "e", bucket=bucket).collect()}
        want = {(pid, iid) for k, t, pid in pts
                for ik, s, e, iid in ivs if ik == k and s <= t < e}
        assert got == want


# ---------------------------------------------------------------------------
# bigram LM scoring / tf-idf top terms vs brute force
# ---------------------------------------------------------------------------

_words = st.sampled_from(["a", "b", "cc", "dd", "e1", "f"])
_doc_texts = st.lists(
    st.lists(_words, min_size=0, max_size=6).map(" ".join), min_size=1, max_size=8
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_doc_texts)
def test_bigram_lm_score_equals_brute_force(spark, texts):
    from collections import Counter

    from ape_dts_spark.functions.text import bigram_lm_score

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in bigram_lm_score(df, "doc_id", "text", 4).collect()}

    toks = {i: t.split() for i, t in rows}
    pair_freq = Counter(p for ts in toks.values() for p in zip(ts, ts[1:]))
    uni_freq = Counter(w for ts in toks.values() for w in ts)
    for i, ts in toks.items():
        pairs = list(zip(ts, ts[1:]))
        want = {
            "doc_id": i,
            "n_bigrams": len(pairs),
            "n_hapax": sum(1 for p in pairs if pair_freq[p] == 1),
            "n_unlikely": sum(1 for p in pairs if pair_freq[p] * 4 < uni_freq[p[0]]),
            "sum_pair_freq": sum(pair_freq[p] for p in pairs),
        }
        assert got[i] == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_doc_texts)
def test_tfidf_topterms_equals_brute_force(spark, texts):
    from collections import Counter

    from ape_dts_spark.functions.text import tfidf_top_terms

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, list] = {}
    for r in tfidf_top_terms(df, "doc_id", "text", k=3).collect():
        got.setdefault(r["doc_id"], []).append((r["rk"], r["term"], r["tf"], r["df"], r["score"]))

    toks = {i: t.split() for i, t in rows}
    dfreq = Counter(w for ts in toks.values() for w in set(ts))
    for i, ts in toks.items():
        tf = Counter(ts)
        scored = sorted(
            ((tf[w] * 1_000_000 // dfreq[w], w) for w in tf), key=lambda x: (-x[0], x[1])
        )
        want = [
            (rk + 1, w, tf[w], dfreq[w], sc) for rk, (sc, w) in enumerate(scored[:3])
        ]
        assert sorted(got.get(i, [])) == want


# ---------------------------------------------------------------------------
# Exact-substring dedup (Lee et al. dup spans) vs brute force
# ---------------------------------------------------------------------------

# tiny alphabet + short docs force heavy window collisions, self-repeats and
# boundary spans that no hand fixture enumerates
_sub_words = st.sampled_from(["x", "y", "z"])
_sub_corpus = st.lists(
    st.lists(_sub_words, min_size=0, max_size=12).map(" ".join), min_size=1, max_size=6
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_sub_corpus, st.integers(2, 4))
def test_dup_spans_equals_brute_force(spark, texts, n):
    """dup_spans must equal the literal definition: mark every position
    whose n-token window occurs >= 2 times corpus-wide, merge overlapping
    coverage per doc; removal drops exactly the covered positions."""
    from collections import Counter

    from ape_dts_spark.functions.dedup import dup_spans, remove_dup_spans

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in dup_spans(df, "doc_id", "text", min_tokens=n).collect():
        got.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
        assert r["span_tokens"] == r["span_end"] - r["span_start"] >= n

    toks = {i: t.split() for i, t in rows}
    wins = Counter(
        tuple(ts[p : p + n]) for ts in toks.values() for p in range(len(ts) - n + 1)
    )
    want, covered = {}, {}
    for i, ts in toks.items():
        seeds = [p for p in range(len(ts) - n + 1) if wins[tuple(ts[p : p + n])] >= 2]
        spans, cov = [], set()
        for p in seeds:
            if spans and p <= spans[-1][1]:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + n))
            else:
                spans.append((p, p + n))
            cov.update(range(p, p + n))
        if spans:
            want[i] = spans
        covered[i] = cov
    assert {k: sorted(v) for k, v in got.items()} == want

    clean = {r["doc_id"]: r.asDict() for r in
             remove_dup_spans(df, "doc_id", "text", min_tokens=n).collect()}
    for i, ts in toks.items():
        kept = [t for p, t in enumerate(ts) if p not in covered[i]]
        assert clean[i]["clean_text"] == " ".join(kept)
        assert clean[i]["n_removed"] == len(covered[i])


# ---------------------------------------------------------------------------
# Tokenizer trio (round 10): a pure-Python WordPiece reimplementation races
# the Spark codegen folds on random corpora — THREE independent
# implementations must agree (Spark fold, DuckDB twin in the gate, and this
# one), and the Viterbi/greedy segmentations must exactly cover the corpus.
# ---------------------------------------------------------------------------

_words = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6), min_size=1, max_size=12
)


def _py_wordpiece(words: list[str], k: int):
    """Independent greedy-merge reference (dicts and loops, no SQL)."""
    from collections import Counter

    from ape_dts_spark.functions.text import WORDPIECE_SCALE, WORDPIECE_UNK

    wc = Counter(words)
    syms = {w: [w[0]] + ["##" + c for c in w[1:]] for w in wc}
    merges = []
    for step in range(k):
        sf: Counter = Counter()
        pf: Counter = Counter()
        for w, cnt in wc.items():
            for s in syms[w]:
                sf[s] += cnt
            for a, b in zip(syms[w], syms[w][1:]):
                pf[(a, b)] += cnt
        if not pf:
            break
        best = min(
            pf.items(),
            key=lambda kv: (-(kv[1] * WORDPIECE_SCALE // (sf[kv[0][0]] * sf[kv[0][1]])), kv[0]),
        )
        (a, b), f = best
        merges.append((step + 1, a, b, f, kv_s(f, sf[a], sf[b])))
        m = a + (b[2:] if b.startswith("##") else b)
        for w in syms:
            out, i = [], 0
            s = syms[w]
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(m)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    vocab = {s for w in wc for s in ([w[0]] + ["##" + c for c in w[1:]])}
    vocab |= {s + (t[2:] if t.startswith("##") else t) for _, s, t, _, _ in merges}
    toks: Counter = Counter()
    for w, cnt in wc.items():
        i, out, unk = 0, [], False
        while i < len(w):
            for klen in range(len(w) - i, 0, -1):
                piece = w[i : i + klen]
                if (piece if i == 0 else "##" + piece) in vocab:
                    out.append(("" if i == 0 else "##") + piece)
                    i += klen
                    break
            else:
                unk = True
                break
        for t in [WORDPIECE_UNK] if unk else out:
            toks[t] += cnt
    return merges, dict(toks)


def kv_s(f, fa, fb):
    from ape_dts_spark.functions.text import WORDPIECE_SCALE

    return f * WORDPIECE_SCALE // (fa * fb)


@given(_words)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_wordpiece_matches_python_reference(spark, words):
    from ape_dts_spark.functions import text as tx

    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    got_m = [
        (r["step"], r["left_sym"], r["right_sym"], r["freq"], r["score_q"])
        for r in tx.wordpiece_learn(docs, "text", k=3).orderBy("step").collect()
    ]
    got_e = {r["token"]: r["freq"] for r in tx.wordpiece_encode(docs, "text", k=3).collect()}
    want_m, want_e = _py_wordpiece(words, 3)
    assert got_m == want_m
    assert got_e == want_e


@given(_words)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_unigram_encode_covers_corpus(spark, words):
    from ape_dts_spark.functions import text as tx

    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    enc = tx.unigram_encode(docs, "text", vocab_size=4, rounds=1, max_word=8).collect()
    got = sum(len(r["token"]) * r["freq"] for r in enc)
    assert got == sum(len(w) for w in words)


# ---------------------------------------------------------------------------
# r12 media codecs: progressive JPEG and GIF/LZW (pure CPU, no Spark)
# ---------------------------------------------------------------------------

_img_shape = st.tuples(st.integers(1, 40), st.integers(1, 40))


@given(
    shape=_img_shape,
    seed=st.integers(0, 2**31 - 1),
    gray=st.booleans(),
    sub=st.sampled_from(["444", "420"]),
    ri=st.sampled_from([0, 1, 3]),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_progressive_jpeg_equals_baseline(shape, seed, gray, sub, ri):
    """Entropy coding is lossless and both encoders share the FDCT/quant
    front half, so progressive decode must equal baseline decode exactly
    for ANY image, subsampling, and restart interval."""
    import numpy as np

    from ape_dts_spark.functions import media_codec as mc

    rng = np.random.RandomState(seed % 2**31)
    h, w = shape
    img = rng.randint(0, 256, (h, w) if gray else (h, w, 3)).astype(np.uint8)
    base = mc.decode_jpeg(mc.encode_jpeg(img, "444" if gray else sub))
    prog = mc.decode_jpeg(
        mc.encode_jpeg_progressive(img, "444" if gray else sub, restart_interval=ri)
    )
    assert (base["pixels"] == prog["pixels"]).all()


@given(
    shape=_img_shape,
    seed=st.integers(0, 2**31 - 1),
    n_colors=st.integers(2, 256),
    interlace=st.booleans(),
    n_frames=st.integers(1, 4),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_gif_lzw_roundtrip_any_palette(shape, seed, n_colors, interlace, n_frames):
    """encode_gif -> parse_gif is the identity on indices for any palette
    size (2..256 spans every LZW minimum-code-size branch), frame count,
    and interlace flag."""
    import numpy as np

    from ape_dts_spark.functions import media_codec as mc

    rng = np.random.RandomState(seed % 2**31)
    h, w = shape
    pal = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
    frames = [rng.randint(0, n_colors, (h, w)).astype(np.uint8) for _ in range(n_frames)]
    rec = mc.parse_gif(mc.encode_gif(frames, pal, interlace=interlace), return_frames=True)
    assert rec["n_frames"] == n_frames
    for a, b in zip(rec["frames"], frames):
        assert (a == b).all()


@given(
    shape=_img_shape,
    seed=st.integers(0, 2**31 - 1),
    depth=st.sampled_from([1, 2, 4, 8, 16]),
    channels=st.sampled_from([1, 2, 3, 4]),
    filter_type=st.integers(0, 4),
    interlace=st.booleans(),
)
@settings(max_examples=14, deadline=None, suppress_health_check=list(HealthCheck))
def test_png_full_matrix_roundtrip_property(shape, seed, depth, channels,
                                            filter_type, interlace):
    """encode_png -> parse_png is the identity across the full legal
    (depth, channels, filter, Adam7) matrix; spec-invalid combinations are
    skipped (sub-8 depths are gray/palette-only)."""
    import numpy as np

    from ape_dts_spark.functions import media_codec as mc

    if depth < 8 and channels != 1:
        return  # spec-invalid combination
    rng = np.random.RandomState(seed % 2**31)
    h, w = shape
    dims = (h, w) if channels == 1 else (h, w, channels)
    img = rng.randint(0, 1 << depth, dims).astype(np.int64)
    rec = mc.parse_png(
        mc.encode_png(img, filter_type=filter_type, bit_depth=depth, interlace=interlace),
        return_pixels=True,
    )
    assert (rec["pixels"] == img).all()


# ---------------------------------------------------------------------------
# DDL scanner string-awareness (r13): for ANY column type + string literal
# content (including comment starters, commas, action keywords, escapes),
# an assembled two-action ALTER must split into exactly its two actions
# with the literal intact.
# ---------------------------------------------------------------------------

_lit_chars = st.text(
    alphabet="ab#-/*, DROPx'\\`\"",
    min_size=0,
    max_size=12,
)


@given(lit=_lit_chars)
@settings(max_examples=200, deadline=None)
def test_ddl_split_survives_any_default_literal(lit):
    from ape_dts_spark.plans.ddl_parse import split_ddl

    # escape for a single-quoted MySQL literal: backslash-escape the two
    # characters that would end or escape the string
    esc = lit.replace("\\", "\\\\").replace("'", "\\'")
    sql = f"ALTER TABLE t ADD a VARCHAR(30) DEFAULT '{esc}', ADD b INT"
    parts = split_ddl(sql)
    assert [p.kind for p in parts] == ["add_column", "add_column"], (sql, parts)
    assert parts[0].args[0] == "a" and parts[1].args == ("b", "INT")
    assert parts[0].args[1] == f"VARCHAR(30) DEFAULT '{esc}'", (sql, parts)
