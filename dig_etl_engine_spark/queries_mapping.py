"""Registry entries for the mapping-spec executor (P1/P2/P7/P8/X11) and
token-pattern rules (X6) — the last §2 operator families: the declarative
tabular-import spec compiled to one DataFrame pipeline, nested child-doc
construction, and the spaCy-rule-surface token matcher."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dig_etl_engine_spark.catalog import load_tables
from dig_etl_engine_spark.operators.mapping import (
    MappingSpec, NestedConfig, apply_mapping, nested_children)
from dig_etl_engine_spark.queries import register


@register(
    "mapping_spec_executor",
    oracle="""
    SELECT c_custkey AS custkey,
           c_name AS name,
           c_mktsegment AS segment,
           trim(c_name || ' operates in ' || c_mktsegment
                || ' [' || '' || ']') AS title,
           'privacyrights' AS test_type,
           'http://example.org/customers.csv#' || c_custkey::VARCHAR AS url,
           'customers' AS dataset_identifier
    FROM customer
    """,
)
def mapping_spec_executor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.3 collapse: ONE spec drives P1 rule mapping + P2 title template
    (with a missing-key substitution) + P4 guarded constant + P8 url/id
    synthesis + F5 remove_fields — compiled to a single shuffle-free
    select (`dig_tabular_import.py:51-263`; `generate_mydig_config.py:
    67-253,433-465`)."""
    customer = load_tables(spark, sf_dir)["customer"]
    spec = MappingSpec(
        rules=[{"path": "c_custkey", "field": "custkey"},
               {"path": "c_name", "field": "name"},
               {"path": "c_mktsegment", "field": "segment"}],
        title="{c_name} operates in {c_mktsegment} [{No Such Column}]",
        constants=[{"field": "test_type", "value": "privacyrights",
                    "dataset": "customers"}],
        file_url="http://example.org/customers.csv",
        id_path="c_custkey",
        dataset_identifier="customers",
        remove_fields=["c_acctbal", "c_nationkey", "c_custkey", "c_name",
                       "c_mktsegment"],
    )
    return apply_mapping(customer, spec)


@register(
    "nested_object_construction",
    oracle="""
    WITH child_account AS (
      SELECT c_custkey AS parent_id, 'account' AS child_path,
             'Account' AS type,
             trim('Account of ' || c_name) AS title,
             c_acctbal::VARCHAR AS balance
      FROM customer WHERE regexp_matches(c_mktsegment, '^(BUILDING|MACHINERY)$')
    ),
    child_loc AS (
      SELECT c_custkey AS parent_id, 'location' AS child_path,
             'Location' AS type, '' AS title,
             c_nationkey::VARCHAR AS nation
      FROM customer
    )
    SELECT parent_id, child_path, type, title, balance AS field_value
    FROM child_account
    UNION ALL
    SELECT parent_id, child_path, type, title, nation FROM child_loc
    """,
)
def nested_object_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 + X11 (`dig_tabular_import.py:412-490`; `generate_mydig_config.py:
    190-221`): guarded nested configs split each wide row into typed child
    docs with a parent FK — one explode, children co-partitioned with
    their parents, independently searchable like the reference's KG
    nodes."""
    customer = load_tables(spark, sf_dir)["customer"]
    spec = MappingSpec(nested_configs=[
        NestedConfig(path="account",
                     rules=[{"path": "c_acctbal", "field": "balance"}],
                     kg_type="Account", title="Account of {c_name}",
                     guards=[{"path": "c_mktsegment",
                              "regex": "^(BUILDING|MACHINERY)$"}]),
        NestedConfig(path="location",
                     rules=[{"path": "c_nationkey", "field": "nation"}],
                     kg_type="Location"),
    ])
    children = nested_children(customer, spec, parent_id_col="c_custkey")
    return children.select(
        "parent_id", "child_path", "type", "title",
        F.coalesce(F.element_at("fields", "balance"),
                   F.element_at("fields", "nation")).alias("field_value"))


@register(
    "token_rule_extract",
    oracle="""
    WITH prose AS (
      SELECT o_orderkey,
             'please call ' || lpad((o_orderkey % 1000)::VARCHAR, 3, '0')
             || ' ' || lpad((o_custkey % 1000)::VARCHAR, 3, '0')
             || ' ' || lpad((o_orderkey % 10000)::VARCHAR, 4, '0')
             || ' or txt HELP now' AS text
      FROM orders
    )
    SELECT o_orderkey,
           regexp_extract(text, '\\d{3} \\d{3} \\d{4}') AS phone,
           regexp_extract(text, '(?:txt|sms)\\s+[A-Z]{4}') AS keyword
    FROM prose
    """,
)
def token_rule_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 SpacyRuleExtractor surface (`em_base.py:12`; museum
    spacy_rules/*.json): token-constraint rules (shape / vocab / exact)
    compile driver-side to ONE regex run by native regexp_extract_all —
    JVM-codegen'd, no per-row Python. Phone-shape and vocab+shape rules
    exercised over deterministic prose built from orders keys."""
    from dig_etl_engine_spark.functions.token_rules import extract_token_rule

    orders = load_tables(spark, sf_dir)["orders"]
    prose = orders.select(
        "o_orderkey",
        F.concat(
            F.lit("please call "),
            F.lpad((F.col("o_orderkey") % 1000).cast("string"), 3, "0"),
            F.lit(" "),
            F.lpad((F.col("o_custkey") % 1000).cast("string"), 3, "0"),
            F.lit(" "),
            F.lpad((F.col("o_orderkey") % 10000).cast("string"), 4, "0"),
            F.lit(" or txt HELP now")).alias("text"))
    phone_rule = [{"shape": "ddd"}, {"shape": "ddd"}, {"shape": "dddd"}]
    kw_rule = [{"in": ["txt", "sms"]}, {"shape": "XXXX"}]
    return prose.select(
        "o_orderkey",
        F.element_at(extract_token_rule(F.col("text"), phone_rule), 1)
        .alias("phone"),
        F.element_at(extract_token_rule(F.col("text"), kw_rule), 1)
        .alias("keyword"))
