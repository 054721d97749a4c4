"""The reference's flagship FGAC scenarios as driver-checkable queries.

Spark side: recreate the healthcare fixture through the engine's own
DDL in a temp warehouse, install the DataCellsFilter + grants, and run
the query through a per-principal SecureSession — i.e. the full FGAC
path (SURVEY.md §2 S1/F1/F2/J1/O1 + A1/A3).

Oracle side: the same rows as a VALUES inline table with the policy
predicate written directly in SQL — DuckDB needs no engine, so the
oracle checks that the policy-wrapped Spark plan produces exactly the
rows/columns Lake Formation would have vended
(producer_iceberg_datalake_setup.sh:240-256 semantics).

Timestamp columns are excluded from the checked outputs (created_at /
updated_at carry no query semantics here and tz normalization across
engines is compare-noise, not signal).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_emr_on_eks_fgac_iceberg_spark.healthcare import (
    CLAIMS_ROWS,
    PATIENTS_ROWS,
    TEAM1,
    setup_healthcare,
)
from sample_emr_on_eks_fgac_iceberg_spark.operators.registry import register

_ENGINES: dict[str, object] = {}


def _engine_for(spark: SparkSession):
    from sample_emr_on_eks_fgac_iceberg_spark.engine import FgacEngine

    key = spark.sparkContext.applicationId
    if key not in _ENGINES:
        eng = FgacEngine(spark, tempfile.mkdtemp(prefix="fgac_wh_"))
        setup_healthcare(eng)
        _ENGINES[key] = eng
    return _ENGINES[key]


def _bounded_key_stream_parts(spark: SparkSession) -> int:
    """State-partition count for the BOUNDED-KEY streaming aggregates.

    A complete-mode stateful aggregate creates one state store (and
    commits one delta file per micro-batch) per shuffle partition, and
    that count is frozen into the checkpoint at stream start. For the
    demo streams the aggregate key domain is bounded by construction
    (US states: ≤ 50 keys at ANY corpus size), so the right sizing is
    key-cardinality-derived, not the session's data-parallel shuffle
    width — 32 (or a cluster's 200+) state stores for ≤ 50 keys is
    pure per-batch commit overhead. Parameterised so a deployment with
    a genuinely wide key domain can raise it."""
    return int(spark.conf.get("spark_graft.stream.bounded_key_partitions", "8"))


class _scoped_shuffle_partitions:
    """Set ``spark.sql.shuffle.partitions`` on the (isolated,
    ``newSession``-backed) SecureSession conf for the duration of a
    stream's definition + drain, restoring the prior value after —
    StreamExecution captures the conf at ``start()``, so the scope only
    needs to cover the drain."""

    def __init__(self, spark: SparkSession, n: int):
        self._spark, self._n = spark, n

    def __enter__(self):
        self._old = self._spark.conf.get("spark.sql.shuffle.partitions")
        self._spark.conf.set("spark.sql.shuffle.partitions", str(self._n))

    def __exit__(self, *exc):
        self._spark.conf.set("spark.sql.shuffle.partitions", self._old)
        return False


def _patients_values_sql() -> str:
    rows = ",\n        ".join(
        f"({pid}, '{name}', DATE '{dob}', '{g}', '{city}', '{state}')"
        for pid, name, dob, g, city, state, _ssn, _c, _u in PATIENTS_ROWS
    )
    return (
        "patients_src(patient_id, patient_name, date_of_birth, gender, city, state) "
        f"AS (VALUES\n        {rows})"
    )


def _claims_values_sql() -> str:
    rows = ",\n        ".join(
        f"('{cid}', {pid}, DATE '{cdate}', '{diag}', '{proc}', "
        f"CAST({amt} AS DECIMAL(10,2)), '{status}', '{prov}')"
        for cid, pid, cdate, diag, proc, amt, status, prov, _c, _u in CLAIMS_ROWS
    )
    return (
        "claims_src(claim_id, patient_id, claim_date, diagnosis_code, "
        "procedure_code, amount, status, provider_id) "
        f"AS (VALUES\n        {rows})"
    )


@register(
    "fgac_patients_scan",
    oracle=f"""
    WITH {_patients_values_sql()}
    SELECT patient_id, patient_name, date_of_birth, gender, city, state
    FROM patients_src
    WHERE state IN ('Texas', 'New York')
    """,
)
def fgac_patients_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 under FGAC: SELECT * expands to the filtered column set and
    the row filter is applied engine-side (consumer job at
    consumer_emr_on_eks_setup.sh:407-410)."""
    sess = _engine_for(spark).session_for(TEAM1)
    return sess.sql("SELECT * FROM patients").select(
        "patient_id", "patient_name", "date_of_birth", "gender", "city", "state"
    )


@register(
    "fgac_catalog_qualified_scan",
    oracle=f"""
    WITH {_patients_values_sql()}
    SELECT patient_id, patient_name, date_of_birth, gender, city, state
    FROM patients_src
    WHERE state IN ('Texas', 'New York')
    """,
)
def fgac_catalog_qualified_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 through a 3-part name: the consumer job's actual relation is
    `dev.consumer_healthcare_db.rl_patients` — a cross-catalog resource
    link (consumer_emr_on_eks_setup.sh:261-287, 407). The policy binds
    to the link name and the qualified reference resolves through the
    SecureSession SQL path."""
    from sample_emr_on_eks_fgac_iceberg_spark.healthcare import QUALIFIED_RL_PATIENTS

    sess = _engine_for(spark).session_for(TEAM1)
    return sess.sql(f"SELECT * FROM {QUALIFIED_RL_PATIENTS}").select(
        "patient_id", "patient_name", "date_of_birth", "gender", "city", "state"
    )


@register(
    "fgac_claims_join",
    oracle=f"""
    WITH {_patients_values_sql()},
         {_claims_values_sql()}
    SELECT p.state, c.claim_id, c.claim_date, p.patient_name,
           c.diagnosis_code, c.procedure_code,
           CAST(c.amount AS DOUBLE) AS amount, c.status, c.provider_id
    FROM claims_src c JOIN patients_src p ON c.patient_id = p.patient_id
    WHERE p.state IN ('Texas', 'New York')
    """,
)
def fgac_claims_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+P2 under FGAC — the reference's flagship join
    (consumer_emr_on_eks_setup.sh:412): only TX/NY patients' claims
    survive because the policy filter composes through the join."""
    sess = _engine_for(spark).session_for(TEAM1)
    df = sess.sql(
        """
        SELECT p.state, c.claim_id, c.claim_date, p.patient_name,
               c.diagnosis_code, c.procedure_code, c.amount, c.status,
               c.provider_id
        FROM claims c JOIN patients p ON c.patient_id = p.patient_id
        """
    )
    return df.withColumn("amount", F.col("amount").cast("double"))


@register(
    "fgac_view_scan",
    oracle=f"""
    WITH {_patients_values_sql()}
    SELECT state, COUNT(*) AS n_patients, COUNT(DISTINCT city) AS n_cities
    FROM patients_src
    WHERE state IN ('Texas', 'New York')
    GROUP BY state
    """,
)
def fgac_view_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 consumer views (SURVEY §1.6: resource link ≈ "a view or
    second catalog name"): the principal CREATEs a view over the
    policy-filtered patients relation and aggregates through it. The
    view is invoker's-rights — its text re-secures under the reader per
    query — so the filtered row set (TX/NY only) is what the aggregate
    sees, and the oracle applies the same predicate directly."""
    sess = _engine_for(spark).session_for(TEAM1)
    sess.sql(
        "CREATE OR REPLACE VIEW patient_states AS "
        "SELECT state, city FROM patients"
    )
    return sess.sql(
        "SELECT state, COUNT(*) AS n_patients, "
        "COUNT(DISTINCT city) AS n_cities "
        "FROM patient_states GROUP BY state"
    )


# ---------------------------------------------------------------------------
# FGAC composed over the LLM-pipeline corpus: the documents table
# loaded into a governed warehouse table, vended to an analyst
# principal through a row filter (lang whitelist) plus a column mask
# (source pseudonymization), with a text-analysis aggregate running on
# the policy-wrapped frame. Shows the two engine halves compose: the
# policy layer governs WHAT the pipeline sees; the pipeline operators
# are unchanged.
# ---------------------------------------------------------------------------

_ANALYST = "corpus-analyst"
_GOV_LANGS = ("en", "de")
# source pseudonymization: stable token, cleartext never vended
_SOURCE_MASK = "concat('src-', substr(md5(source), 1, 8))"


def _gov_engine_for(spark: SparkSession, sf_dir: str):
    from sample_emr_on_eks_fgac_iceberg_spark.engine import FgacEngine
    from sample_emr_on_eks_fgac_iceberg_spark.policy import DataCellsFilter
    from sample_emr_on_eks_fgac_iceberg_spark.sources.tables import load_table

    key = (spark.sparkContext.applicationId, sf_dir, "gov_docs")
    if key not in _ENGINES:
        eng = FgacEngine(spark, tempfile.mkdtemp(prefix="fgac_docs_wh_"))
        docs = load_table(spark, sf_dir, "documents")
        eng.warehouse.create_table(
            "documents_gov", "doc_id BIGINT, text STRING, lang STRING, "
            "source STRING, n_chars BIGINT"
        )
        eng.warehouse.insert_into("documents_gov", docs)
        langs = ", ".join(f"'{lg}'" for lg in _GOV_LANGS)
        eng.policy.create_data_cells_filter(
            DataCellsFilter(
                name="docs_lang_masked",
                table="documents_gov",
                row_filter=f"lang in ({langs})",
                column_masks={"source": _SOURCE_MASK},
            )
        )
        eng.policy.grant(_ANALYST, "documents_gov", filter_name="docs_lang_masked")
        _ENGINES[key] = eng
    return _ENGINES[key]


@register(
    "fgac_corpus_stats",
    oracle=f"""
    SELECT lang,
           concat('src-', substr(md5(source), 1, 8)) AS source_token,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE lang IN ({", ".join(f"''{lg}''" for lg in _GOV_LANGS).replace("''", "'")})
    GROUP BY lang, source_token
    """,
)
def fgac_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus accounting under FGAC: the analyst principal sees only
    whitelisted languages and a pseudonymized source token; the
    aggregate runs on the policy-wrapped frame, so the row filter and
    mask push into the same scan the pipeline uses."""
    sess = _gov_engine_for(spark, sf_dir).session_for(_ANALYST)
    return sess.sql(
        """
        SELECT lang, source AS source_token,
               COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
        FROM documents_gov GROUP BY lang, source
        """
    )


_GOV_LANGS_SQL = ", ".join(f"'{lg}'" for lg in _GOV_LANGS)


@register(
    "fgac_udtf_corpus_spans",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang,
               unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents
        WHERE lang IN ({_GOV_LANGS_SQL})),
    spans AS (
        SELECT doc_id, lang, (i - 1) // 16 AS span_idx, COUNT(*) AS n_tok
        FROM toks GROUP BY doc_id, lang, (i - 1) // 16)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM spans GROUP BY lang
    """,
)
def fgac_udtf_corpus_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF on the CONSUMER surface (VERDICT r13 #1's FGAC
    probe): the analyst lateral-explodes the governed corpus through
    the ``word_spans`` table function. The UDTF runs OVER the policy
    view — the row filter (lang ∈ en/de) applies before the explode,
    so UDTF output can never resurrect filtered rows: the oracle
    counts spans from the filtered corpus only, and a doc outside the
    whitelist contributing even one span would break n_spans/n_docs.
    The UDTF registers into the analyst's ISOLATED session registry
    (engine-provided function library, session-scoped — no cross-
    principal leakage through the function registry)."""
    from sample_emr_on_eks_fgac_iceberg_spark.operators.udfs import register_udtfs

    sess = _gov_engine_for(spark, sf_dir).session_for(_ANALYST)
    register_udtfs(sess.spark)
    return sess.sql(
        """
        SELECT lang, COUNT(*) AS n_spans,
               SUM(s.n_tokens) AS n_tokens,
               COUNT(DISTINCT doc_id) AS n_docs
        FROM documents_gov d, LATERAL word_spans(d.text, 16) s
        GROUP BY lang
        """
    )


@register(
    "fgac_stream_patients_agg",
    oracle=f"""
    WITH {_patients_values_sql()}
    SELECT state, CAST(COUNT(*) AS BIGINT) AS n_patients
    FROM patients_src
    WHERE state IN ('Texas', 'New York')
    GROUP BY state
    """,
)
def fgac_stream_patients_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-mediated STRUCTURED STREAM (SURVEY §7 Stage 3, VERDICT
    r11 missing #2): team 1 tails `patients` through
    SecureSession.readStream — the DataCellsFilter applies to the
    unbounded frame BEFORE the stateful aggregate, and an ungranted
    principal would raise at stream definition, before any micro-batch
    (the reference's vend-at-job-start model,
    producer_iceberg_datalake_setup.sh:240-256). The stream drains with
    an availableNow trigger into a memory sink; the returned batch
    frame must equal the batch policy-filtered rollup — which is
    exactly what the VALUES oracle encodes."""
    import uuid

    sess = _engine_for(spark).session_for(TEAM1)
    agg = (
        sess.readStream("patients")
        .groupBy("state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_patients"))
    )
    sink = f"fgac_stream_{uuid.uuid4().hex[:8]}"
    with _scoped_shuffle_partitions(
        sess.spark, _bounded_key_stream_parts(sess.spark)
    ):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # NOTE (harness shape, not the production path): complete-mode
    # memory sinks buffer the whole result on the DRIVER — fine here
    # (≤2 groups; the point is a driver-checkable frame), wrong for a
    # large-key stream. Production streams land through the
    # exactly-once warehouse sinks (streaming/ingest.py /
    # SecureSession.writeStream_into), which stay executor-side.
    return sess.spark.table(sink)


@register(
    "fgac_stream_write_ingest",
    oracle=f"""
    WITH {_patients_values_sql()}
    SELECT state, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(patient_id) AS BIGINT) AS min_pid,
           CAST(MAX(patient_id) AS BIGINT) AS max_pid
    FROM patients_src
    WHERE state IN ('Texas', 'New York')
    GROUP BY state
    """,
)
def fgac_stream_write_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-mediated streaming WRITE (VERDICT r12 missing #1): team 1
    tails its policy-filtered `patients` stream and LANDS it into a
    governed table through ``SecureSession.writeStream_into`` — INSERT
    is authorized at sink definition (an ungranted principal raises
    before any micro-batch; tests/test_streaming.py), every micro-batch
    commits under the exactly-once ``(source_id, batch_id)`` fence, and
    the read-side FGAC filter composes INTO the write: only TX/NY rows
    (and no ssn column) ever reach the landing table. Re-running the
    query replays the same batch ids under the same source_id — fenced,
    so the landed state is stable and the VALUES oracle (the filtered
    source rollup) matches on every run."""
    import tempfile

    eng = _engine_for(spark)
    sess = eng.session_for(TEAM1)
    if not eng.warehouse.table_exists("patients_landed"):
        eng.warehouse.create_table(
            "patients_landed",
            "patient_id BIGINT, patient_name STRING, date_of_birth DATE, "
            "gender STRING, city STRING, state STRING, "
            "created_at TIMESTAMP, updated_at TIMESTAMP",
        )
        from sample_emr_on_eks_fgac_iceberg_spark.policy import INSERT, SELECT

        eng.policy.grant(TEAM1, "patients_landed", {SELECT, INSERT})
    sess.writeStream_into(
        sess.readStream("patients"),
        "patients_landed",
        "fgac-stream-ingest",
        tempfile.mkdtemp(prefix="fgac_sw_ckpt_"),
    )
    return sess.sql(
        """
        SELECT state, COUNT(*) AS n_rows,
               MIN(patient_id) AS min_pid, MAX(patient_id) AS max_pid
        FROM patients_landed GROUP BY state
        """
    )


# deterministic multi-version CDC feed for the streaming upsert: three
# keys, the last version per key (by ver) is the expected final state
_UPSERT_FEED = [
    (1, "alpha", 1),
    (2, "bravo", 1),
    (1, "alpha-v2", 2),
    (3, "charlie", 1),
    (2, "bravo-v2", 2),
    (1, "alpha-v3", 3),
]


@register(
    "fgac_stream_upsert_state",
    oracle=f"""
    WITH feed(k, v, ver) AS (VALUES
        {", ".join(f"({k}, '{v}', {ver})" for k, v, ver in _UPSERT_FEED)}),
    last AS (
        SELECT k, v, ver,
               ROW_NUMBER() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
        FROM feed)
    SELECT k, v, ver FROM last WHERE rn = 1
    """,
)
def fgac_stream_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-mediated streaming UPSERT (the CDC-apply half of VERDICT
    r12 missing #1): a granted principal streams a multi-version feed
    through ``SecureSession.upsert_writeStream_into`` — INSERT+DELETE
    both authorized at sink definition (an upsert rewrites matched
    rows: the batch UPDATE/MERGE permission rule), each micro-batch
    MERGEs last-version-per-key (order_by=ver), and replays are fenced
    by ``txn=(source_id, batch_id)``. The final table state must equal
    the feed's last version per key — exactly what the VALUES oracle's
    row_number computes. Re-running the query replays fenced batch ids,
    so the state (and the driver-checked result) is stable."""
    import tempfile

    from sample_emr_on_eks_fgac_iceberg_spark.policy import (
        DELETE,
        INSERT,
        SELECT,
    )

    eng = _engine_for(spark)
    if not eng.warehouse.table_exists("cdc_feed"):
        eng.warehouse.create_table("cdc_feed", "k BIGINT, v STRING, ver BIGINT")
        eng.warehouse.insert_values("cdc_feed", _UPSERT_FEED)
        eng.warehouse.create_table(
            "cdc_state", "k BIGINT, v STRING, ver BIGINT"
        )
        eng.warehouse.set_identifier_fields("cdc_state", ["k"])
        eng.policy.grant(TEAM1, "cdc_feed", {SELECT})
        eng.policy.grant(TEAM1, "cdc_state", {SELECT, INSERT, DELETE})
    sess = eng.session_for(TEAM1)
    sess.upsert_writeStream_into(
        sess.readStream("cdc_feed"),
        "cdc_state",
        "fgac-cdc-apply",
        "t.k = s.k",
        ["k"],
        tempfile.mkdtemp(prefix="fgac_up_ckpt_"),
        order_by="ver",
    )
    return sess.sql("SELECT k, v, ver FROM cdc_state")


@register(
    "fgac_pivot_state_gender",
    oracle=f"""
    WITH {_patients_values_sql()}
    SELECT state,
           CAST(COUNT(*) FILTER (gender = 'M') AS BIGINT) AS m,
           CAST(COUNT(*) FILTER (gender = 'F') AS BIGINT) AS f
    FROM patients_src
    WHERE state IN ('Texas', 'New York')
    GROUP BY state
    """,
)
def fgac_pivot_state_gender(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL ``PIVOT`` on the CONSUMER surface: the clause composes with
    the DataCellsFilter — only TX/NY rows reach the pivot (a cell for
    a filtered-out state can never appear), and listing a whitelisted-
    out column in the IN clause is an unresolved column, never data
    (tests/test_sql_surface.py). The oracle applies the policy
    predicate and the engine-agnostic FILTER rollup."""
    sess = _engine_for(spark).session_for(TEAM1)
    return sess.sql(
        """
        SELECT * FROM (SELECT state, gender, 1 AS one FROM patients)
        PIVOT (COUNT(one) FOR gender IN ('M' AS m, 'F' AS f))
        """
    )


@register(
    "fgac_stream_view_agg",
    oracle=f"""
    WITH {_patients_values_sql()}
    SELECT state, CAST(COUNT(DISTINCT city) AS BIGINT) AS n_cities,
           CAST(COUNT(*) AS BIGINT) AS n_patients
    FROM patients_src
    WHERE state IN ('Texas', 'New York')
    GROUP BY state
    """,
)
def fgac_stream_view_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING a shared producer view under policy (VERDICT r12
    missing #3): the producer publishes `v_patient_geo`; team 1 tails
    it with ``readStream(view)`` — the body replans over team 1's OWN
    policy-filtered streaming source (invoker's rights: SELECT
    authorized at stream definition, row filter + column whitelist on
    the unbounded frame), so the streamed rollup equals the batch read
    through the same view. Memory sink in complete mode = driver-sized
    by design (2 groups; the production path is the warehouse sinks —
    PLANS.md note)."""
    import uuid

    eng = _engine_for(spark)
    if "v_patient_geo" not in eng.warehouse.list_views():
        eng.sql(
            "CREATE VIEW v_patient_geo AS SELECT state, city FROM patients"
        )
    sess = eng.session_for(TEAM1)
    agg = (
        sess.readStream("v_patient_geo")
        .groupBy("state")
        .agg(
            # COUNT(DISTINCT) is unsupported on streaming frames —
            # size(collect_set) is the streaming-legal exact spelling
            # (bounded here: cities per state)
            F.size(F.collect_set("city")).cast("bigint").alias("n_cities"),
            F.count(F.lit(1)).cast("bigint").alias("n_patients"),
        )
    )
    sink = f"fgac_svagg_{uuid.uuid4().hex[:8]}"
    with _scoped_shuffle_partitions(
        sess.spark, _bounded_key_stream_parts(sess.spark)
    ):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return sess.spark.table(sink)
