"""Source adapters: AIDA TSV, PPRforNED candidates, vocab, redirects,
gzipped JSONL — format-identical synthetic fixtures (the reference's data
files are license-gated and absent from its snapshot)."""

import gzip
import json
import os

from spel_spark.sources.aida import mention_candidate_rank_join, read_aida_tsv, split_of
from spel_spark.sources.resources import (
    read_jsonl_gz,
    read_ppr_candidates,
    read_redirects_json,
    read_vocab,
)

AIDA_TSV = """-DOCSTART- (1 EU)
EU\tB\tEU\t--NME--
rejects\tO
German\tB\tGerman\tGermany\thttp://en.wikipedia.org/wiki/Germany\t11867\t/m/0345h
call\tO

second\tO
sentence\tO
-DOCSTART- (947testa CRICKET)
LEICESTERSHIRE\tB\tLeicestershire\tLeicestershire_County_Cricket_Club\thttp://en.wikipedia.org/wiki/Leicestershire_County_Cricket_Club\t247747
"""


def test_read_aida_tsv(spark, tmp_path):
    p = tmp_path / "aida.tsv"
    p.write_text(AIDA_TSV)
    df = read_aida_tsv(spark, str(p))
    rows = {
        (r.doc_id, r.token): r for r in df.collect()
    }
    assert len(rows) == 7
    eu = rows[(1, "EU")]
    assert (eu.bio, eu.full_mention, eu.yago_entity) == ("B", "EU", "--NME--")
    german = rows[(1, "German")]
    assert german.wiki_id == "11867" and german.freebase_mid == "/m/0345h"
    assert german.sentence_idx == rows[(1, "EU")].sentence_idx
    assert rows[(1, "second")].sentence_idx > german.sentence_idx
    lei = rows[(2, "LEICESTERSHIRE")]
    assert lei.doc_header == "947testa CRICKET"
    sp = {r.doc_header: r.s for r in df.select(
        "doc_header", split_of(df["doc_header"]).alias("s")).distinct().collect()}
    assert sp == {"1 EU": "train", "947testa CRICKET": "testa"}
    # token_idx dense per doc
    idx = sorted(r.token_idx for r in df.filter("doc_id = 1").collect())
    assert idx == list(range(len(idx)))


PPR_DOC_1 = """ENTITY\ttext:EU\tnormalName:eu\tpredictedType:ORG\tq:true\tqid:Q123\tdocId:1\torigText:EU\turl:http://en.wikipedia.org/wiki/EU
CANDIDATE\tid:123\tinCount:10\toutCount:5\tlinks:0\turl:http://en.wikipedia.org/wiki/European_Union\tname:European Union\tnormalName:european union\tnormalWikiTitle:european_union\tpredictedType:ORG
CANDIDATE\tid:456\tinCount:2\toutCount:1\tlinks:0\turl:http://en.wikipedia.org/wiki/Europe\tname:Europe\tnormalName:europe\tnormalWikiTitle:europe\tpredictedType:LOC
ENTITY\ttext:German\tnormalName:german\tpredictedType:MISC\tq:true\tqid:Q183\tdocId:1\torigText:German call\turl:http://en.wikipedia.org/wiki/Germany
CANDIDATE\tid:789\tinCount:99\toutCount:3\tlinks:0\turl:http://en.wikipedia.org/wiki/Germany\tname:Germany\tnormalName:germany\tnormalWikiTitle:germany\tpredictedType:LOC
"""


def test_read_ppr_candidates(spark, tmp_path):
    d = tmp_path / "ppr"
    d.mkdir()
    (d / "2").write_text(PPR_DOC_1)  # member name = doc_id + 1
    records, cands = read_ppr_candidates(spark, str(d))
    recs = {r.record_idx: r for r in records.collect()}
    assert len(recs) == 2
    assert recs[0].doc_id == 1 and recs[0].orig_text == "EU"
    assert recs[1].non_considered_word_count == 2  # "German call"
    cs = sorted((r.record_idx, r.id, r.in_count) for r in cands.collect())
    assert cs == [(0, "123", 10), (0, "456", 2), (1, "789", 99)]


def test_read_ppr_candidates_zip_matches_extracted(spark, tmp_path):
    """S2 from the zip itself (ref aida.py:174-187): the distributed
    zip-member read must yield exactly what the pre-extracted-files path
    yields — no user-side extraction step."""
    import zipfile

    from spel_spark.sources.resources import read_ppr_candidates_zip, read_zip_members

    d = tmp_path / "ppr"
    d.mkdir()
    (d / "2").write_text(PPR_DOC_1)
    ppr_doc_2 = PPR_DOC_1.replace("docId:1", "docId:6").replace("Q123", "Q999")
    (d / "7").write_text(ppr_doc_2)
    zp = tmp_path / "PPRforNED.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.write(d / "2", "2")
        zf.write(d / "7", "7")
        # real-world zip noise: resource forks / docs must not become
        # phantom candidate records (reference only opens numeric members)
        zf.writestr("__MACOSX/._2", "\x00junk")
        zf.writestr("README", "not a doc")

    members = {r.member: r.content for r in read_zip_members(spark, str(zp)).collect()}
    assert set(members) == {"2", "7", "__MACOSX/._2", "README"}
    assert members["2"] == PPR_DOC_1

    recs_z, cands_z = read_ppr_candidates_zip(spark, str(zp))
    recs_f, cands_f = read_ppr_candidates(spark, str(d))
    assert sorted(map(tuple, recs_z.collect()), key=lambda t: t[:2]) == sorted(
        map(tuple, recs_f.collect()), key=lambda t: t[:2]
    )
    assert sorted(map(tuple, cands_z.collect())) == sorted(
        map(tuple, cands_f.collect())
    )
    assert {r.doc_id for r in recs_z.collect()} == {1, 6}


def test_read_ppr_candidates_zip_crlf_members(spark, tmp_path):
    """A zip written on Windows carries CRLF members; splitting on '\\n'
    alone would leave '\\r' glued to the last field of every record
    (round-3 advice #3 — F.trim strips spaces only)."""
    import zipfile

    from spel_spark.sources.resources import read_ppr_candidates_zip

    zp = tmp_path / "crlf.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("2", PPR_DOC_1.replace("\n", "\r\n"))
    recs, cands = read_ppr_candidates_zip(spark, str(zp))
    urls = [r.url for r in recs.collect()] + [r.url for r in cands.collect()]
    assert urls and all(not u.endswith("\r") for u in urls), urls
    # byte-identical to the LF parse
    recs_lf, cands_lf = read_ppr_candidates(spark, _write_ppr_dir(tmp_path))
    assert sorted(map(tuple, recs.collect())) == sorted(map(tuple, recs_lf.collect()))
    assert sorted(map(tuple, cands.collect())) == sorted(map(tuple, cands_lf.collect()))


def _write_ppr_dir(tmp_path):
    d = tmp_path / "ppr_lf"
    d.mkdir(exist_ok=True)
    (d / "2").write_text(PPR_DOC_1)
    return str(d)


def test_mention_candidate_rank_join(spark):
    tokens = spark.createDataFrame(
        [(1, 0, "B", "EU"), (1, 3, "B", "EU"), (1, 5, "B", "Bonn")],
        "doc_id int, token_idx int, bio string, full_mention string",
    )
    records = spark.createDataFrame(
        [(1, 0, "EU"), (1, 1, "EU"), (1, 2, "Bonn")],
        "doc_id int, record_idx int, orig_text string",
    )
    out = mention_candidate_rank_join(tokens, records)
    got = {(r.token_idx, r.record_idx) for r in out.collect()}
    # first EU token consumes first EU record, second the second (J1)
    assert got == {(0, 0), (3, 1), (5, 2)}


def test_read_vocab(spark, tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("Germany\nEuropean_Union\nBonn\n")
    v = {r.entity_title: r.entity_id for r in read_vocab(spark, str(p)).collect()}
    assert v == {"|||O|||": 0, "<pad>": 1, "Germany": 2, "European_Union": 3, "Bonn": 4}


def test_read_redirects_json(spark, tmp_path):
    p = tmp_path / "redirects.json"
    p.write_text(json.dumps({"Wash._Post": "The_Washington_Post", "EU": "European_Union"}))
    got = {r.alias: r.canonical for r in read_redirects_json(spark, str(p)).collect()}
    assert got["Wash._Post"] == "The_Washington_Post"
    assert got["EU"] == "European_Union"


def test_read_redirects_json_large(spark, tmp_path):
    """Scale check: a 100K-alias dimension parses in one from_json pass
    (the round-1 column-per-key form did a driver round-trip per key)."""
    import time

    p = tmp_path / "redirects_big.json"
    big = {f"Alias_{i}": f"Canonical_{i % 1000}" for i in range(100_000)}
    p.write_text(json.dumps(big))
    t0 = time.time()
    df = read_redirects_json(spark, str(p))
    assert df.count() == 100_000
    assert time.time() - t0 < 30
    row = df.filter(df["alias"] == "Alias_123").first()
    assert row.canonical == "Canonical_123"


def test_read_jsonl_gz(spark, tmp_path):
    p = tmp_path / "train.jsonl.gz"
    rows = [
        {"tokens": ["a", "b"], "mentions": [["X"]], "mention_probs": [[1.0]]},
        {"tokens": ["c"], "mentions": [[]], "mention_probs": [[]]},
    ]
    with gzip.open(p, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    schema = (
        "tokens array<string>, mentions array<array<string>>, "
        "mention_probs array<array<double>>"
    )
    df = read_jsonl_gz(spark, str(p), schema)
    got = sorted(r.tokens for r in df.collect())
    assert got == [["a", "b"], ["c"]]
