"""Golden end-to-end test: acled/pitf-shaped nested events (SURVEY §2.6 J2;
FIXTURES.md §2).

The reference's event datasets (`datasets/events/pitf.jl:1`,
`datasets/events/acled.jl`) carry a nested ``actors`` array of
``{id, description, title}`` structs, and the events master_config links
actor child records into event parents by id (`_actor_kg_id`). This golden
exercises that shape end-to-end on an inline fixture:

    explode(actors) → J2 equi-join on actor id (broadcast dim) →
    KG assembly → long-format index

Every expected row is derivable by hand from the fixture. The join is a
left join — the reference keeps an event's actor mention even when the
actor id has no KG node yet (dangling links are the norm mid-ingest).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dig_etl_engine_spark.functions import extractors as X
from dig_etl_engine_spark.functions.kg import kg_build, kg_index

_EVENT_SCHEMA = (
    "doc_id string, event_type array<string>, death_count int, "
    "actors array<struct<id:string, description:string, title:string>>, "
    "raw_content string"
)

# actor ids mimic the reference's concatenated-token ids (pitf.jl:1)
_A1 = "forcesgovernmentstate"
_A2 = "armedgrouprebel"
_A3 = "civiliansnoncombatant"
_A4 = "unknownunclearother"          # deliberately absent from the dim


def _events(spark):
    rows = [
        ("e1", ["Incident", "Firearms"], 1,
         [(_A1, "State Forces", "Army patrol"),
          (_A2, "Rebel Group", "Insurgent cell")], "."),
        ("e2", ["Incident", "Attack/Massacre"], 13,
         [(_A2, "Rebel Group", "Insurgent cell"),
          (_A3, "Noncombatant", "Village civilians")], "."),
        ("e3", ["Protest"], 0, [(_A1, "State Forces", "Police unit")], "."),
        ("e4", ["Statement"], 0, [], "."),                   # no actors
        ("e5", ["Incident"], 2,
         [(_A4, "Unknown/Unclear/Other", "Unknown gunmen")], "."),
        ("e6", ["Incident", "Arson"], 0,
         [(_A3, "Noncombatant", "Shop owners"),
          (_A1, "State Forces", "Militia")], "."),
    ]
    return spark.createDataFrame(rows, _EVENT_SCHEMA)


def _actor_dim(spark):
    # the KG-node side of the J2 link: one row per known actor id
    rows = [(_A1, "state"), (_A2, "rebel"), (_A3, "civilian"),
            ("neverreferenced", "orphan")]
    return spark.createDataFrame(rows, "actor_id string, actor_class string")


def _linked(spark):
    events, dim = _events(spark), _actor_dim(spark)
    mentions = events.select(
        "doc_id", F.explode("actors").alias("a"),
    ).select("doc_id", F.col("a.id").alias("actor_id"),
             F.col("a.title").alias("actor_title"))
    return mentions.join(F.broadcast(dim), "actor_id", "left")


class TestGoldenNestedEvents:
    @pytest.fixture(scope="class")
    def linked(self, spark):
        return _linked(spark).cache()

    def test_explode_join_rows(self, linked):
        # 6 events, 8 actor mentions (e4's empty array yields none);
        # left join keeps e5's dangling id with a null class
        got = {(r.doc_id, r.actor_id): r.actor_class
               for r in linked.collect()}
        assert len(got) == 8
        assert got[("e1", _A1)] == "state"
        assert got[("e1", _A2)] == "rebel"
        assert got[("e2", _A3)] == "civilian"
        assert got[("e5", _A4)] is None          # dangling link survives
        assert not any(doc == "e4" for doc, _ in got)
        # the dim's unreferenced row must not leak in (join, not union)
        assert not any(a == "neverreferenced" for _, a in got)

    def test_kg_index_from_linked(self, linked, spark):
        # KG assembly: actor titles as extractions, linked classes as a
        # second field; dangling links contribute no class extraction
        per_doc = linked.groupBy("doc_id").agg(
            F.array_sort(F.collect_list("actor_title")).alias("titles"),
            F.array_sort(F.collect_list("actor_class")).alias("classes"),
        )
        kg = kg_build(per_doc, {
            "actor": X._results(F.col("titles"), "kg_link", "actors"),
            "actor_class": X._results(F.col("classes"), "kg_link", "actors"),
        })
        index = kg_index(kg)
        by_field = {r["field"]: r["n"] for r in
                    index.groupBy("field").agg(F.count("*").alias("n"))
                    .collect()}
        # 8 mentions; collect_list drops e5's null class → 7 class rows
        assert by_field == {"actor": 8, "actor_class": 7}
        e6 = sorted(r.value for r in index.filter(
            (F.col("doc_id") == "e6") & (F.col("field") == "actor"))
            .collect())
        assert e6 == ["Militia", "Shop owners"]
        keys = {r.key for r in index.filter(
            F.col("field") == "actor_class").collect()}
        assert keys == {"state", "rebel", "civilian"}

    def test_event_type_facet(self, spark):
        # the other nested column: event_type array<string> facet counts
        events = _events(spark)
        got = {(r.et, r.n) for r in
               events.select(F.explode("event_type").alias("et"))
               .groupBy("et").agg(F.count("*").alias("n")).collect()}
        assert ("Incident", 4) in got
        assert ("Protest", 1) in got
