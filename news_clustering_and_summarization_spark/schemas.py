"""Explicit StructType schemas for the engine's table kinds.

The reference is schema-on-read (JSON documents, required fields only
documented in prose — reference README.md:204-221,
data/example_article.json:1-13). We pin explicit schemas at the edges
and use a permissive ``from_json`` for ingest so unknown keys are
tolerated like the reference's dict passthrough
(pre_process_docs.py:108-111).
"""

from __future__ import annotations

from pyspark.sql import types as T

EMBED_DIM = 512  # reference iac/roots/main/variables.tf:51-55 (MAX_LENGTH)

# Vendor columns the preprocess stage drops (reference
# pre_process_docs.py:85-106). Public-data articles don't carry them but
# the drop must be a no-op-safe projection either way.
VENDOR_DROP_COLUMNS = [
    "vendor_data",
    "headline_only",
    "deckline",
    "version",
    "story_link",
    "copyright_line",
    "display_date",
    "received_date",
    "publication_reason",
    "media",
    "spam",
    "control_flags",
    "issuer",
    "market",
    "business_relevance",
    "cluster_signature",
    "headline_cluster_signature",
    "signals",
    "cik",
    "feed",
]

_entity_struct_long = T.ArrayType(
    T.StructType(
        [
            T.StructField("long_name", T.StringType()),
            T.StructField("relevance", T.DoubleType()),
        ]
    )
)
_entity_struct_name = T.ArrayType(
    T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("relevance", T.DoubleType()),
        ]
    )
)

# Raw article as ingested (reference README.md:204-221).
ARTICLE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("event_id", T.StringType()),
        T.StructField("duplicate", T.BooleanType()),
        T.StructField("lang", T.StringType()),
        T.StructField("bag_id", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("cluster", T.StringType()),
    ]
)

# Vendor-enriched variant with entity annotations
# (reference pre_process_docs.py:23-79; disabled for public data).
ARTICLE_VENDOR_SCHEMA = T.StructType(
    list(ARTICLE_SCHEMA.fields)
    + [
        T.StructField("subjects", _entity_struct_long),
        T.StructField("industries", _entity_struct_long),
        T.StructField("organizations", _entity_struct_name),
        T.StructField("people", _entity_struct_name),
        T.StructField("locations", _entity_struct_long),
    ]
    + [T.StructField(c, T.StringType()) for c in VENDOR_DROP_COLUMNS]
)

# Post-preprocess (reference pre_process_docs.py:108-132).
ARTICLE_ENRICHED_SCHEMA = T.StructType(
    list(ARTICLE_SCHEMA.fields)
    + [
        T.StructField("summary", T.StringType()),
        T.StructField("publication_date", T.StringType()),
    ]
)

# Post-embed (reference embed_docs.py:97-98: `concat_embedding` is a
# 1-element outer list wrapping the vector).
ARTICLE_EMBEDDED_SCHEMA = T.StructType(
    list(ARTICLE_ENRICHED_SCHEMA.fields)
    + [
        T.StructField("embed_text", T.StringType()),
        T.StructField(
            "concat_embedding", T.ArrayType(T.ArrayType(T.FloatType()))
        ),
    ]
)

# Cluster pool state (reference process_records.py:34-43: three parallel
# lists label_tracker / is_cluster / embeds keyed by pool position).
CLUSTER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("row_id", T.LongType(), False),
        T.StructField("cluster_id", T.StringType(), False),
        T.StructField("article_ids", T.ArrayType(T.StringType()), False),
        T.StructField("is_cluster", T.BooleanType(), False),
        T.StructField("centroid", T.ArrayType(T.DoubleType()), False),
    ]
)

# Serving store, normalized from the DynamoDB single-table design
# (reference iac/roots/main/main.tf:50-87, process_records.py:216-268).
CLUSTERS_SCHEMA = T.StructType(
    [
        T.StructField("PK", T.StringType(), False),
        T.StructField("SK", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("created_at", T.StringType()),
        T.StructField("number_of_articles", T.LongType()),
        T.StructField("generated_summary", T.StringType()),
        T.StructField("summary_count", T.LongType()),
        T.StructField("description", T.StringType()),
        T.StructField("is_cluster", T.BooleanType()),
        T.StructField("most_common_location", T.StringType()),
        T.StructField("most_common_organization", T.StringType()),
        T.StructField("earliest_date", T.StringType()),
        T.StructField("latest_date", T.StringType()),
    ]
)

CLUSTER_ARTICLES_SCHEMA = T.StructType(
    [
        T.StructField("PK", T.StringType(), False),
        T.StructField("SK", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("article_id", T.StringType(), False),
        T.StructField("title", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("organizations", T.ArrayType(T.StringType())),
        T.StructField("locations", T.ArrayType(T.StringType())),
        T.StructField("publication_date", T.StringType()),
        T.StructField("entry_creation_date", T.StringType()),
    ]
)

# Change feed emitted by the cluster-table merge (reference: DynamoDB
# Stream NEW_IMAGE, main.tf:85-93). Matches what
# operators/cluster.incremental_cluster_update actually produces; like
# the reference's trigger lambda (trigger_sfn.py:34-44), consumers
# join the clusters metadata table for summary_count before applying
# the threshold.
CLUSTER_UPDATES_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("PK", T.StringType(), False),
        T.StructField("SK", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("number_of_articles", T.LongType()),
        T.StructField("article_ids", T.ArrayType(T.StringType())),
    ]
)

# Multimodal asset table: opaque binary payload + typed metadata
# (engine extension; no reference analogue — see operators/multimodal.py).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)
