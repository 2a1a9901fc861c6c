"""Object-store conf wiring + CREATE EXTERNAL TABLE DDL.

Mirrors extensions/s3.rs:37-72 (per-bucket store registration),
extensions/huggingface.rs:39-101 (hf:// URL contract incl. the
'/'→'-' repo-id munging), and tests/extension_cases/deltalake.rs:23-45
(STORED AS DELTATABLE DDL). No network in this container: S3/HF tests
assert the conf/URL contract; the Delta activation test is skip-marked
on classpath availability with the gated error path always tested.
"""

from __future__ import annotations

import pytest

from datafusion_dft_spark.catalog import table_path
from datafusion_dft_spark.config import parse_config
from datafusion_dft_spark.sources.delta import DeltaNotAvailable, delta_available
from datafusion_dft_spark.sources.object_store import (
    HuggingFaceConfig,
    S3Config,
    parse_object_store,
    register_object_stores,
    resolve_hf_url,
    s3_conf_entries,
)
from datafusion_dft_spark.sql import prepare_statement

TOML_RAW = {
    "execution": {
        "object_store": {
            "s3": [
                {
                    "bucket_name": "my-bucket",
                    "object_store_url": "s3://my-bucket",
                    "aws_access_key_id": "AKID",
                    "aws_secret_access_key": "SECRET",
                    "aws_endpoint": "http://localhost:9000",
                    "aws_session_token": "TOK",
                    "aws_allow_http": True,
                }
            ],
            "huggingface": [
                {"repo_id": "huggingfacetb/finemath", "revision": "main"}
            ],
        }
    }
}


def test_parse_object_store_toml():
    cfg = parse_config(TOML_RAW)
    os_cfg = cfg.execution.object_store
    assert os_cfg is not None
    assert os_cfg.s3[0].bucket_name == "my-bucket"
    assert os_cfg.s3[0].aws_allow_http is True
    assert os_cfg.huggingface[0].repo_id == "huggingfacetb/finemath"


def test_s3_conf_entries_per_bucket():
    entries = s3_conf_entries(
        S3Config(
            bucket_name="b1",
            aws_access_key_id="k",
            aws_secret_access_key="s",
            aws_endpoint="http://minio:9000",
            aws_session_token="t",
            aws_allow_http=True,
            aws_default_region="us-east-1",
        )
    )
    pre = "spark.hadoop.fs.s3a.bucket.b1"
    assert entries[f"{pre}.access.key"] == "k"
    assert entries[f"{pre}.secret.key"] == "s"
    assert entries[f"{pre}.endpoint"] == "http://minio:9000"
    assert entries[f"{pre}.path.style.access"] == "true"
    assert entries[f"{pre}.session.token"] == "t"
    assert "TemporaryAWSCredentialsProvider" in entries[f"{pre}.aws.credentials.provider"]
    assert entries[f"{pre}.connection.ssl.enabled"] == "false"
    assert entries[f"{pre}.endpoint.region"] == "us-east-1"


def test_register_object_stores_lands_conf(spark):
    cfg = parse_config(TOML_RAW).execution.object_store
    urls = register_object_stores(spark, cfg)
    assert urls == ["s3://my-bucket", "hf://huggingfacetb-finemath"]
    # session conf carries the keys (observable surface)...
    assert spark.conf.get("spark.hadoop.fs.s3a.bucket.my-bucket.endpoint") == "http://localhost:9000"
    # ...and the live Hadoop conf (the effective one for s3a) does too.
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    assert hc.get("fs.s3a.bucket.my-bucket.access.key") == "AKID"
    assert hc.get("fs.s3a.bucket.my-bucket.connection.ssl.enabled") == "false"


def test_resolve_hf_url_contract():
    cfgs = [HuggingFaceConfig(repo_id="huggingfacetb/finemath", revision="main")]
    # the reference's example URL (huggingface.rs:84-90)
    assert (
        resolve_hf_url("hf://huggingfacetb-finemath/finemath-3plus/train-00000-of-00128.parquet", cfgs)
        == "https://huggingface.co/datasets/huggingfacetb/finemath/resolve/main/finemath-3plus/train-00000-of-00128.parquet"
    )


def test_resolve_hf_url_root_and_revision():
    cfgs = [HuggingFaceConfig(repo_id="org/repo", repo_type="models", revision="v2", root="sub/dir")]
    assert (
        resolve_hf_url("hf://org-repo/f.parquet", cfgs)
        == "https://huggingface.co/models/org/repo/resolve/v2/sub/dir/f.parquet"
    )


def test_resolve_hf_url_unknown_host():
    with pytest.raises(ValueError, match="no registered huggingface store"):
        resolve_hf_url("hf://nope-nothing/x.parquet", [])
    with pytest.raises(ValueError, match="not an hf"):
        resolve_hf_url("s3://b/x.parquet", [])


def test_external_table_parquet_ddl(spark, sf_dir):
    stmt = f"CREATE EXTERNAL TABLE ext_nation STORED AS PARQUET LOCATION '{table_path(sf_dir, 'nation')}'"
    res = spark.sql(prepare_statement(spark, stmt))
    assert res.count() == 0  # DDL: empty, schema-stable result
    assert spark.table("ext_nation").count() == 25
    # IF NOT EXISTS short-circuits on the registered view
    stmt2 = f"CREATE EXTERNAL TABLE IF NOT EXISTS ext_nation STORED AS PARQUET LOCATION '{table_path(sf_dir, 'nation')}'"
    spark.sql(prepare_statement(spark, stmt2))
    spark.catalog.dropTempView("ext_nation")


def test_external_table_full_grammar(spark, tmp_path):
    """DataFusion's fuller CREATE EXTERNAL TABLE: explicit column list
    (DataFusion type spellings), OPTIONS (COPY vocabulary), PARTITIONED
    BY over hive-layout directories; misuse fails at DDL time."""
    # schema'd CSV with a non-default delimiter, no header
    csv_dir = tmp_path / "csvdata"
    csv_dir.mkdir()
    (csv_dir / "a.csv").write_text("1;alpha;2.5\n2;beta;3.5\n")
    stmt = (
        "CREATE EXTERNAL TABLE ext_sc (id BIGINT, name VARCHAR, score DOUBLE) "
        "STORED AS CSV "
        "OPTIONS ('format.delimiter' ';', 'format.has_header' 'false') "
        f"LOCATION '{csv_dir}'"
    )
    spark.sql(prepare_statement(spark, stmt))
    df = spark.table("ext_sc")
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "string", "double",
    ]
    assert {(r.id, r.name, r.score) for r in df.collect()} == {
        (1, "alpha", 2.5), (2, "beta", 3.5),
    }
    # hive-partitioned parquet with PARTITIONED BY verification
    pq_dir = tmp_path / "pqdata"
    for part in ("x", "y"):
        spark.range(3).write.mode("overwrite").parquet(str(pq_dir / f"part={part}"))
    stmt = (
        "CREATE EXTERNAL TABLE ext_part STORED AS PARQUET "
        f"PARTITIONED BY (part) LOCATION '{pq_dir}'"
    )
    spark.sql(prepare_statement(spark, stmt))
    assert spark.table("ext_part").where("part = 'x'").count() == 3
    with pytest.raises(ValueError, match="PARTITIONED BY column"):
        prepare_statement(
            spark,
            "CREATE EXTERNAL TABLE ext_bad STORED AS PARQUET "
            f"PARTITIONED BY (nope) LOCATION '{pq_dir}'",
        )
    with pytest.raises(ValueError, match="not supported for STORED AS DELTATABLE"):
        prepare_statement(
            spark,
            "CREATE EXTERNAL TABLE ext_d (a INT) STORED AS DELTATABLE "
            f"LOCATION '{tmp_path}'",
        )
    for v in ("ext_sc", "ext_part"):
        spark.catalog.dropTempView(v)


def test_external_table_clause_order_and_types(spark, tmp_path):
    """DataFusion accepts the tail clauses in any order; type spellings
    carry constraints; malformed DDL raises an actionable error instead
    of falling through to an unrelated Spark ParseException."""
    csv_dir = tmp_path / "csvdata2"
    csv_dir.mkdir()
    (csv_dir / "a.csv").write_text("1,alpha\n2,beta\n")
    # LOCATION before OPTIONS (docs ordering), WITH HEADER ROW legacy,
    # constraint-carrying VARCHAR, case-insensitive PARTITIONED BY
    stmt = (
        "CREATE EXTERNAL TABLE ext_oo (id BIGINT NOT NULL, name VARCHAR NOT NULL) "
        f"STORED AS CSV LOCATION '{csv_dir}' "
        "OPTIONS ('format.has_header' 'false')"
    )
    spark.sql(prepare_statement(spark, stmt))
    assert spark.table("ext_oo").count() == 2
    stmt = (
        "CREATE EXTERNAL TABLE ext_hdr (id BIGINT, name VARCHAR) "
        f"WITH HEADER ROW STORED AS CSV LOCATION '{csv_dir}'"
    )
    spark.sql(prepare_statement(spark, stmt))
    # header row consumed the first data line
    assert spark.table("ext_hdr").count() == 1
    pq_dir = tmp_path / "pq2"
    spark.range(2).write.mode("overwrite").parquet(str(pq_dir / "part=x"))
    stmt = (
        "CREATE EXTERNAL TABLE ext_ci STORED AS PARQUET "
        f"PARTITIONED BY (PART) LOCATION '{pq_dir}'"
    )
    spark.sql(prepare_statement(spark, stmt))  # case-insensitive: no raise
    # TIMESTAMP WITH TIME ZONE maps to Spark TIMESTAMP
    from datafusion_dft_spark.sql import _df_schema_to_spark

    assert _df_schema_to_spark("ts TIMESTAMP WITH TIME ZONE NOT NULL") == (
        "ts TIMESTAMP NOT NULL"
    )
    assert _df_schema_to_spark("v REAL, n VARCHAR(10)") == "v float, n VARCHAR(10)"
    # glued table name / unknown clause: loud, statement-specific error
    with pytest.raises(ValueError, match="unsupported CREATE EXTERNAL TABLE"):
        prepare_statement(
            spark, "CREATE EXTERNAL TABLE fooSTORED AS PARQUET LOCATION '/x'"
        )
    with pytest.raises(ValueError, match="STORED AS"):
        prepare_statement(spark, f"CREATE EXTERNAL TABLE t2 LOCATION '{csv_dir}'")
    for v in ("ext_oo", "ext_hdr", "ext_ci"):
        spark.catalog.dropTempView(v)


def test_external_table_deltatable_gated(spark, tmp_path):
    """extension_cases/deltalake.rs:23-45 — the DDL path exists; a
    location with no transaction log must fail actionably, not with a
    ClassNotFound/AnalysisException stack (real reads are covered by
    tests/test_delta.py on a protocol fixture)."""
    stmt = f"CREATE EXTERNAL TABLE d STORED AS DELTATABLE LOCATION '{tmp_path}'"
    if delta_available(spark):
        pytest.skip("delta-spark on classpath; covered by activation test")
    with pytest.raises(DeltaNotAvailable, match="commit log"):
        prepare_statement(spark, stmt)


@pytest.mark.skipif(True, reason="activation test: needs delta-spark jars on the classpath")
def test_external_table_deltatable_activation(spark, tmp_path):
    """With delta-spark bundled: write a table, DDL-register, read back
    (the reference's deltalake.rs happy path)."""
    path = str(tmp_path / "delta_tbl")
    spark.range(3).selectExpr("id * 2 + 5 AS id").write.format("delta").save(path)
    spark.sql(prepare_statement(spark, f"CREATE EXTERNAL TABLE d STORED AS DELTATABLE LOCATION '{path}'"))
    assert sorted(r.id for r in spark.table("d").collect()) == [5, 7, 9]


def test_external_table_bad_format(spark):
    # VORTEX moved from "unsupported" to the gated vortex-python path
    # (sources/io.py::read_vortex) in round 6 — use a genuinely unknown
    # format to exercise the rejection branch.
    with pytest.raises(ValueError, match="unsupported STORED AS"):
        prepare_statement(spark, "CREATE EXTERNAL TABLE x STORED AS ORCZ LOCATION '/tmp/x'")


def test_s3_credential_chain_opt_in():
    """docs/config.md 'AWS Credential Chain': default pins the provider
    to static TOML credentials (no ambient identity pickup); opt-in
    chains TOML -> env -> web identity -> instance profile."""
    from datafusion_dft_spark.sources.object_store import S3Config, s3_conf_entries

    pre = "spark.hadoop.fs.s3a.bucket.b"
    static = s3_conf_entries(
        S3Config(bucket_name="b", aws_access_key_id="K", aws_secret_access_key="S")
    )
    assert (
        static[f"{pre}.aws.credentials.provider"]
        == "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
    )
    chain = s3_conf_entries(
        S3Config(
            bucket_name="b",
            aws_access_key_id="K",
            aws_secret_access_key="S",
            use_credential_chain=True,
        )
    )
    prov = chain[f"{pre}.aws.credentials.provider"]
    assert prov.startswith("org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider,")
    assert "IAMInstanceCredentialsProvider" in prov
    # session token flips the static head to Temporary
    tok = s3_conf_entries(
        S3Config(bucket_name="b", aws_session_token="t", use_credential_chain=True)
    )
    assert tok[f"{pre}.aws.credentials.provider"].startswith(
        "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider,"
    )
    # keyless entries keep s3a's own default resolution (no pin) so
    # pre-existing ambient-credential configs keep working
    keyless = s3_conf_entries(S3Config(bucket_name="b", aws_endpoint="http://m"))
    assert f"{pre}.aws.credentials.provider" not in keyless
    keyless_chain = s3_conf_entries(S3Config(bucket_name="b", use_credential_chain=True))
    assert keyless_chain[f"{pre}.aws.credentials.provider"].startswith(
        "com.amazonaws.auth.EnvironmentVariableCredentialsProvider,"
    )


def test_s3_partial_static_key_pair_raises():
    """A secret without a key id (typo'd field) must not silently fall
    through to ambient credentials — half a static pair is a
    misconfiguration and fails loudly."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="aws_access_key_id"):
        s3_conf_entries(S3Config(bucket_name="b", aws_secret_access_key="S"))
    with _pytest.raises(ValueError, match="aws_secret_access_key"):
        s3_conf_entries(S3Config(bucket_name="b", aws_access_key_id="K"))


def test_s3_token_only_pinned_mode_raises():
    """aws_session_token without the key pair pins the temporary-
    credential provider, which cannot work — config-time error in
    pinned mode; chain mode falls through and stays allowed."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="aws_session_token"):
        s3_conf_entries(S3Config(bucket_name="b", aws_session_token="t"))
    # chain mode: survivable (falls through to env/instance providers)
    out = s3_conf_entries(
        S3Config(bucket_name="b", aws_session_token="t", use_credential_chain=True)
    )
    assert "TemporaryAWSCredentialsProvider" in out["spark.hadoop.fs.s3a.bucket.b.aws.credentials.provider"]
