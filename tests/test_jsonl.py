"""JSONL quarantine loader unit coverage."""

from distributed_web_crawler_spark.sources.jsonl import parse_jsonl


def test_jsonl_clean_corrupt_and_type_mismatch(spark):
    lines = spark.createDataFrame(
        [(0, '{"id": 7, "lang": "en", "n": 3}'),   # clean
         (1, '{"id": 8'),                           # truncated -> corrupt
         (2, '{"id": "NaN", "lang": "fr"}'),        # bad type -> corrupt
         (3, '{"lang": "de"}')],                    # missing fields: clean
        "line_id long, line string")
    out = {r.line_id: r for r in
           parse_jsonl(lines, "id BIGINT, lang STRING, n BIGINT").collect()}
    assert (out[0].id, out[0].lang, out[0].n) == (7, "en", 3)
    assert not out[0].is_corrupt and out[0].raw is None
    assert out[1].is_corrupt and out[1].raw == '{"id": 8'
    assert out[1].id is None
    assert out[2].is_corrupt  # type mismatch routes to quarantine too
    assert out[2].lang == "fr"  # PERMISSIVE keeps the parseable fields
    assert not out[3].is_corrupt and out[3].id is None
    assert out[3].lang == "de"
