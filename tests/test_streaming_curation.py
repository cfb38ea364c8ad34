"""End-to-end incremental curation pipeline: two consecutive availableNow
runs, the second deduping against the first run's persisted band index."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from alma_publish_to_marc_spark.streaming import curation as CU

GOOD_A = ("the quick brown fox jumps over the lazy dog and then the fox "
          "runs back to the den with a bone for the young pups to chew on "
          "while the sun sets over the quiet hills in the far west")
GOOD_B = ("a tall ship sails on the open sea with the wind at its back and "
          "the crew sings songs of home while the captain charts a course "
          "to the islands where the trade winds blow warm all year")
LOW_QUALITY = "the !!! the ??? the ... and ;;; of :::"
UND_LANG = "zzz qqq xxx vvv kkk zzz qqq xxx vvv kkk"


def _drop(landing: str, name: str, rows: list[tuple[int, str]]) -> None:
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        os.path.join(landing, name))


def _audit(spark, state: str) -> dict[int, dict]:
    rows = spark.read.parquet(os.path.join(state, "audit")).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_two_batch_incremental_curation(spark, tmp_path):
    landing = tmp_path / "landing"
    state = tmp_path / "state"
    ckpt = tmp_path / "ckpt"
    landing.mkdir()

    # ---- run 1: two good docs, one low-quality, one unknown-language,
    # and an exact within-batch twin of GOOD_A
    _drop(str(landing), "drop1.parquet", [
        (1, GOOD_A), (2, GOOD_B), (3, LOW_QUALITY), (4, UND_LANG),
        (5, GOOD_A),
    ])
    CU.run_incremental_curation(spark, str(landing), str(state), str(ckpt))

    audit = _audit(spark, str(state))
    assert audit[1]["drop_reason"] == "kept"
    assert audit[2]["drop_reason"] == "kept"
    assert audit[3]["drop_reason"] == "quality"
    assert audit[4]["drop_reason"] == "lang"
    assert audit[5]["drop_reason"] == "batch_duplicate"  # 1 < 5 keeps 1
    kept_run1 = {d for d, r in audit.items() if r["kept"]}
    assert kept_run1 == {1, 2}

    index_ids = {r["doc_id"] for r in spark.read.parquet(
        os.path.join(str(state), "index_sigs")).collect()}
    assert index_ids == {1, 2}
    shard_rows = spark.read.parquet(
        os.path.join(str(state), "shards")).collect()
    assert {r["doc_id"] for r in shard_rows} == {1, 2}

    # ---- run 2: a near-dup of GOOD_A (tail variant) must be caught by
    # the PERSISTED index from run 1; a fresh doc must survive
    _drop(str(landing), "drop2.parquet", [
        (10, GOOD_A + " with one extra tail"),
        (11, ("deep in the green valley the river bends past the old mill "
              "and the miller waves to the children who race their paper "
              "boats along the bank until the evening bell calls them in")),
    ])
    CU.run_incremental_curation(spark, str(landing), str(state), str(ckpt))

    audit = _audit(spark, str(state))
    assert audit[10]["drop_reason"] == "corpus_duplicate"
    assert audit[10]["batch_id"] != audit[1]["batch_id"]
    assert audit[11]["drop_reason"] == "kept"
    index_ids = {r["doc_id"] for r in spark.read.parquet(
        os.path.join(str(state), "index_sigs")).collect()}
    assert index_ids == {1, 2, 11}
    shard_rows = spark.read.parquet(
        os.path.join(str(state), "shards")).collect()
    assert {r["doc_id"] for r in shard_rows} == {1, 2, 11}

    # ---- replay with the same checkpoint: nothing new lands, state
    # unchanged (exactly-once)
    CU.run_incremental_curation(spark, str(landing), str(state), str(ckpt))
    assert len(_audit(spark, str(state))) == 7


def test_incremental_span_removal_against_gram_index(spark, tmp_path):
    """Run 3 of the pipeline: a kept doc that QUOTES an 8-gram from an
    earlier batch's kept doc ships to its shard with that span removed
    (the persisted gram index drives the rewrite), while the quoted
    doc's own shard text stays intact."""
    import os

    landing = tmp_path / "landing"
    state = tmp_path / "state"
    ckpt = tmp_path / "ckpt"
    landing.mkdir()

    doc11 = ("deep in the green valley the river bends past the old mill "
             "and the miller waves to the children who race their paper "
             "boats along the bank until the evening bell calls them in")
    _drop(str(landing), "d1.parquet", [(11, doc11)])
    CU.run_incremental_curation(spark, str(landing), str(state), str(ckpt))

    span = "deep in the green valley the river bends"  # doc11's first 8
    filler_a = ("orchard stones gather moss and a quiet lane of elm trees "
                "is winding toward sunrise")
    filler_b = ("while copper lanterns glow and a ferry of travelers is "
                "crossing under pale stars toward harbor lights tonight")
    doc20 = f"{filler_a} {span} {filler_b}"
    _drop(str(landing), "d2.parquet", [(20, doc20)])
    CU.run_incremental_curation(spark, str(landing), str(state), str(ckpt))

    audit = _audit(spark, str(state))
    assert audit[11]["kept"] and audit[20]["kept"]  # quote != near-dup

    shards = {r["doc_id"]: r["text"] for r in spark.read.parquet(
        os.path.join(str(state), "shards")).collect()}
    # the quoted doc keeps its text verbatim
    assert shards[11] == doc11
    # the quoting doc lost exactly the 8 span words, nothing else
    got_words = shards[20].split()
    assert len(got_words) == len(doc20.split()) - 8
    assert "valley" not in got_words and "bends" not in got_words
    assert got_words[:3] == ["orchard", "stones", "gather"]
    assert got_words[-3:] == ["harbor", "lights", "tonight"]


def test_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-executing the SAME batch id
    (a crash between state writes and the checkpoint commit) must
    leave state and shards byte-identical — no doubled audit rows, no
    self-flagged corpus duplicates, no span-stripped shards."""
    import os

    state = str(tmp_path / "state")
    doc = ("the quick brown fox jumps over the lazy dog and then the fox "
           "runs back to the den with a bone for the young pups to chew")
    batch = spark.createDataFrame([(1, doc)], "doc_id long, text string")

    CU.curate_batch(spark, batch, state, batch_id=0)
    audit1 = sorted(map(tuple, spark.read.parquet(
        os.path.join(state, "audit")).collect()))
    shards1 = sorted(map(tuple, spark.read.parquet(
        os.path.join(state, "shards")).collect()))

    # replay the same batch (same id): the crash-recovery path
    CU.curate_batch(spark, batch, state, batch_id=0)
    audit2 = sorted(map(tuple, spark.read.parquet(
        os.path.join(state, "audit")).collect()))
    shards2 = sorted(map(tuple, spark.read.parquet(
        os.path.join(state, "shards")).collect()))
    assert audit1 == audit2
    assert shards1 == shards2
    # the doc stayed kept with its text intact (no self-dup, no strip)
    assert len(audit2) == 1 and audit2[0][3] == "kept"
    texts = {r["text"] for r in spark.read.parquet(
        os.path.join(state, "shards")).collect()}
    assert texts == {doc}


@pytest.mark.slow  # sf0.1 sweep; the sf0.001 idempotence gate above
def test_batch_replay_idempotent_at_sf01(spark, tmp_path):
    """VERDICT r06 item 7: the OVERWRITE-partition idempotency claim,
    exercised at sf0.1 corpus scale (5000 real documents) instead of a
    single unit row. Batch 0 lands the first 4000 docs; batch 1 lands
    the remaining 1000 (which near-dup/quote against batch 0's
    persisted band + gram indexes, so the replay has REAL cross-batch
    state to corrupt). Re-running batch 1 with the same batch_id — the
    crash-between-state-write-and-checkpoint-commit path — must leave
    every state table and the published shards byte-identical."""
    import os

    state = str(tmp_path / "state")
    docs = (spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
            .select("doc_id", "text"))
    batch0 = docs.where("doc_id % 5 != 0")
    batch1 = docs.where("doc_id % 5 = 0")

    CU.curate_batch(spark, batch0, state, batch_id=0)
    CU.curate_batch(spark, batch1, state, batch_id=1)

    def snapshot():
        out = {}
        for table in ("audit", "index_bands", "index_sigs",
                      "gram_counts", "shards"):
            p = os.path.join(state, table)
            rows = spark.read.parquet(p).collect()
            out[table] = sorted(
                tuple(x if not isinstance(x, list) else tuple(x)
                      for x in r) for r in rows)
        return out

    before = snapshot()
    # replay batch 1 (same id): at-least-once crash recovery
    CU.curate_batch(spark, batch1, state, batch_id=1)
    after = snapshot()
    for table in before:
        assert before[table] == after[table], table
    # sanity: the replayed batch really had survivors and real state
    n_kept_b1 = sum(1 for r in spark.read.parquet(
        os.path.join(state, "audit")).collect()
        if r["batch_id"] == 1 and r["kept"])
    assert n_kept_b1 > 0
