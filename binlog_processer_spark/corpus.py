"""Deterministic pre-tokenized CDC corpus, derived from the driver's
``documents`` table — the engine's input fixture.

BASELINE.json mandates the input shape ``(doc_id:string, tokens:array<int32>,
n_tok:int32, source:string)`` plus CDC semantics (Create/Update/Delete events
with before/after images, file order, commit timestamps — reference:
binlog-resovler BinlogFileReader.java:284-343, SchemaData.java:150-168).
The driver's testdata has no token corpus, so we derive one *deterministically
and SQL-expressibly* from ``documents``: every derived column is pure
arithmetic / md5 / string ops that Spark SQL and DuckDB compute identically.
The same template renders in both dialects, so the DuckDB oracle and the Spark
engine consume byte-identical inputs (FIXTURES.md F5 determinism rule).

Derived event stream (1–3 events per doc, repeated doc_ids so the cross-op
cancellation paths of AvroDataReader.java:128-135 execute):

- ``tokens``      polynomial char hash per whitespace word, % 32000, int32
- ``op``          (doc_id*31 + r*17) % 20 → <14 Create, <19 Update, else Delete
- ``event_seq``   doc_id*4 + r  (binlog file order surrogate)
- ``commit_ts``   2024-01-01 + ((doc_id*7 + r*13) % 100000) minutes
- ``create_ts``   2024-01-01 + ((doc_id*11) % 80000) minutes (per-doc constant)
- ``file_id``     source || '-f' || (doc_id/20 % 5)  (resume/lineage unit;
                  the /20 de-correlates from the driver's source = doc_id%20)
- ``bucket``      doc_id%10<4 → 0 (hot ~46%, exercises salting) else doc_id%4
- ``table_key``   source || '#' || bucket          (TABLE_MAP join key)
- ``sign``        (doc_id*3 + r) % 97: 0→1, 1→0, else NULL (soft-delete flag
                  events, IgnoreStrategy.java:10-30 analogue)

Routing maps source ``src13`` to database_name ``mysql`` — a system schema —
so the P1 system-schema filter (BinlogFileReader.java:188-190) is exercised
by the oracle contract, not just pytest.
"""

from __future__ import annotations

TOKEN_MOD = 32000
EPOCH = "2024-01-01 00:00:00"

_DIALECTS = {
    "spark": {
        "STR": "string",
        "SPLIT": "split(trim({s}), '\\\\s+')",
        "TRANSFORM": "transform",
        "SIZE": "size",
        "EMPTY_INT_ARRAY": "cast(array() as array<int>)",
        "MINUTES": "make_interval(0, 0, 0, 0, 0, cast({n} as int), 0)",
        "VALUES": "SELECT {cols} FROM VALUES {rows} AS t({cols})",
    },
    "duckdb": {
        "STR": "varchar",
        "SPLIT": "regexp_split_to_array(trim({s}), '\\s+')",
        "TRANSFORM": "list_transform",
        "SIZE": "len",
        "EMPTY_INT_ARRAY": "cast([] as int[])",
        "MINUTES": "to_minutes(cast({n} as bigint))",
        "VALUES": "SELECT {cols} FROM (VALUES {rows}) t({cols})",
    },
}


def token_hash_expr(var: str = "w") -> str:
    """Horner polynomial hash over the first 8 chars (base 31, % 32000).

    ``ascii(substr(w, i, 1))`` is 0 past end-of-string in both engines, so
    short words hash consistently. All-bigint to satisfy Spark ANSI mode.
    """
    e = f"cast(ascii(substr({var},1,1)) as bigint)"
    for i in range(2, 9):
        e = f"({e}*31 + ascii(substr({var},{i},1)))"
    return f"cast({e} % {TOKEN_MOD} as int)"


def tokens_expr(text_col: str, d: dict) -> str:
    split = d["SPLIT"].format(s=text_col)
    return (
        f"CASE WHEN {text_col} IS NULL OR length(trim({text_col})) = 0 "
        f"THEN {d['EMPTY_INT_ARRAY']} "
        f"ELSE {d['TRANSFORM']}({split}, w -> {token_hash_expr('w')}) END"
    )


def corpus_ctes(dialect: str) -> str:
    """WITH-clause body defining ``corpus`` and ``routing`` over ``documents``.

    Compose as ``f"WITH {corpus_ctes(d)} SELECT ... FROM corpus ..."``.
    """
    d = _DIALECTS[dialect]
    copies = d["VALUES"].format(cols="r", rows="(0), (1), (2)")
    buckets = d["VALUES"].format(cols="bucket", rows="(0), (1), (2), (3)")
    minutes_commit = d["MINUTES"].format(n="(doc_num*7 + r*13) % 100000")
    minutes_create = d["MINUTES"].format(n="(doc_num*11) % 80000")
    versions = d["VALUES"].format(cols="v", rows="(1), (2), (3)")
    # schema versions become valid at minute 0 / 30000 / 60000 — events pick
    # the floor entry (SchemaRepository.java:52-77 TreeMap floor analogue)
    schema_v = d["MINUTES"].format(n="(v.v - 1) * 30000")
    return f"""
copies AS ({copies}),
base AS (
  SELECT d.doc_id AS doc_num,
         cast(d.doc_id AS {d['STR']}) AS doc_id,
         d.source, d.lang, d.text, c.r
  FROM documents d JOIN copies c ON c.r <= d.doc_id % 3
),
corpus AS (
  SELECT
    doc_id, doc_num, source, lang, r,
    {tokens_expr('text', d)} AS tokens,
    cast({d['SIZE']}({tokens_expr('text', d)}) AS int) AS n_tok,
    CASE WHEN (doc_num*31 + r*17) % 20 < 14 THEN 'Create'
         WHEN (doc_num*31 + r*17) % 20 < 19 THEN 'Update'
         ELSE 'Delete' END AS op,
    cast(doc_num*4 + r AS bigint) AS event_seq,
    timestamp '{EPOCH}' + {minutes_commit} AS commit_ts,
    timestamp '{EPOCH}' + {minutes_create} AS create_ts,
    source || '-f' || cast(cast(floor(doc_num / 20) AS bigint) % 5 AS {d['STR']}) AS file_id,
    cast(CASE WHEN doc_num % 10 < 4 THEN 0 ELSE doc_num % 4 END AS int) AS bucket,
    source || '#' || cast(CASE WHEN doc_num % 10 < 4 THEN 0 ELSE doc_num % 4 END AS {d['STR']}) AS table_key,
    CASE WHEN (doc_num*3 + r) % 97 = 0 THEN 1
         WHEN (doc_num*3 + r) % 97 = 1 THEN 0
         ELSE cast(NULL AS int) END AS sign
  FROM base
),
routing AS (
  SELECT
    s.source || '#' || cast(b.bucket AS {d['STR']}) AS table_key,
    s.source AS r_source, b.bucket AS r_bucket,
    'inst' || cast(b.bucket % 2 AS {d['STR']}) AS db_instance,
    'db_' || s.source || cast(b.bucket % 2 + 1 AS {d['STR']}) AS database_sharded,
    CASE WHEN s.source = 'src13' THEN 'mysql'
         ELSE 'db_' || s.source END AS database_name,
    't' || cast(b.bucket AS {d['STR']}) AS table_name,
    CASE WHEN s.source = 'src13' THEN 'mysql'
         ELSE 'db_' || s.source END || '.t' || cast(b.bucket AS {d['STR']}) AS route,
    (s.source = 'src15' AND b.bucket = 3) AS ignored
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN ({buckets}) b
),
schema_dim AS (
  SELECT r.table_key,
         timestamp '{EPOCH}' + {schema_v} AS valid_from_ts,
         'fp_v' || cast(v.v AS {d['STR']}) AS schema_fingerprint
  FROM routing r CROSS JOIN ({versions}) v
)"""


def corpus_spark_df(spark, sf_dir: str, select: str = "SELECT * FROM corpus"):
    """Register ``documents`` from ``sf_dir`` and return a corpus DataFrame."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(f"WITH {corpus_ctes('spark')} {select}")


def duckdb_sql(select: str) -> str:
    """Full DuckDB statement: corpus/routing CTEs + the given SELECT."""
    return f"WITH {corpus_ctes('duckdb')} {select}"
