"""Object-store registration: S3 and HuggingFace config → Spark conf.

Reference:

- S3: ``[[execution.object_store.s3]]`` TOML entries with bucket name,
  credentials, endpoint and allow_http build an object store that is
  registered for the bucket's URL
  (crates/datafusion-app/src/config.rs:162-236,
  crates/datafusion-app/src/extensions/s3.rs:37-72). Spark's native
  equivalent is the Hadoop s3a connector, which supports exactly this
  per-bucket override surface via
  ``spark.hadoop.fs.s3a.bucket.<bucket>.*`` keys — registration here
  means landing each config field on its s3a counterpart, after which
  ``spark.read.parquet("s3a://bucket/...")`` (and ``s3://`` via scheme
  aliasing) scans distribute across executors with the usual
  split/pushdown machinery. No network in this container, so tests
  assert the conf landing, not a live read.
- HuggingFace: ``[[execution.object_store.huggingface]]`` entries
  register an ``hf://org-repo/...`` store
  (crates/datafusion-app/src/extensions/huggingface.rs:39-101). Spark
  has no hf filesystem; the scale-correct Spark path is resolving
  ``hf://`` URLs to the hub's stable ``resolve`` HTTPS endpoints and
  reading those (executor-side fetch). ``resolve_hf_url`` implements
  the URL contract (including the reference's '/'→'-' repo-id munging,
  huggingface.rs:79-90); the fetch itself needs network and is gated.
"""

from __future__ import annotations

from dataclasses import dataclass
from pyspark.sql import SparkSession


@dataclass
class S3Config:
    """config.rs:162-177 — one S3-compatible store (per bucket)."""

    bucket_name: str
    object_store_url: str | None = None
    aws_access_key_id: str | None = None
    aws_secret_access_key: str | None = None
    aws_default_region: str | None = None
    aws_endpoint: str | None = None
    aws_session_token: str | None = None
    aws_allow_http: bool | None = None
    # docs/config.md "AWS Credential Chain": opt-in resolution from
    # env vars / web identity / container / instance profile, with TOML
    # static credentials (when present) taking precedence. Default
    # false = only TOML credentials are used.
    use_credential_chain: bool = False


@dataclass
class HuggingFaceConfig:
    """huggingface.rs:39-101 — one hf:// repo registration."""

    repo_id: str
    repo_type: str = "datasets"
    revision: str = "main"
    root: str | None = None
    token: str | None = None


@dataclass
class ObjectStoreConfig:
    s3: list[S3Config]
    huggingface: list[HuggingFaceConfig]


def parse_object_store(raw: dict) -> ObjectStoreConfig:
    """Parse the ``[execution.object_store]`` TOML block."""
    return ObjectStoreConfig(
        s3=[
            S3Config(
                bucket_name=e["bucket_name"],
                object_store_url=e.get("object_store_url"),
                aws_access_key_id=e.get("aws_access_key_id"),
                aws_secret_access_key=e.get("aws_secret_access_key"),
                aws_default_region=e.get("aws_default_region"),
                aws_endpoint=e.get("aws_endpoint"),
                aws_session_token=e.get("aws_session_token"),
                aws_allow_http=e.get("aws_allow_http"),
                use_credential_chain=bool(e.get("use_credential_chain", False)),
            )
            for e in raw.get("s3", [])
        ],
        huggingface=[
            HuggingFaceConfig(
                repo_id=e["repo_id"],
                repo_type=e.get("repo_type", "datasets"),
                revision=e.get("revision", "main"),
                root=e.get("root"),
                token=e.get("token"),
            )
            for e in raw.get("huggingface", [])
        ],
    )


def s3_conf_entries(cfg: S3Config) -> dict[str, str]:
    """Map one S3Config onto per-bucket s3a Hadoop conf keys.

    Per-bucket (not global) so multiple stores with different
    endpoints/credentials coexist — the same multi-store semantics the
    reference gets from one object store per registered URL.
    """
    pre = f"spark.hadoop.fs.s3a.bucket.{cfg.bucket_name}"
    out: dict[str, str] = {}
    if cfg.aws_access_key_id:
        out[f"{pre}.access.key"] = cfg.aws_access_key_id
    if cfg.aws_secret_access_key:
        out[f"{pre}.secret.key"] = cfg.aws_secret_access_key
    if cfg.aws_session_token:
        out[f"{pre}.session.token"] = cfg.aws_session_token
    # Credential resolution (docs/config.md): with use_credential_chain
    # the provider list starts at the TOML credentials (override) and
    # falls through env vars → web identity/container → instance
    # profile — s3a's chain equivalents. Without it (default), a bucket
    # that DOES carry static TOML credentials is PINNED to the
    # static-credential provider so an unintended ambient AWS identity
    # can never shadow them; a keyless entry (bucket + endpoint only)
    # keeps s3a's own default resolution, preserving pre-existing
    # configs that rely on it.
    static_provider = (
        "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
        if cfg.aws_session_token
        else "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
    )
    # ANY static field counts (a secret without a key id must not make
    # the entry silently fall through to an ambient identity), and a
    # half-specified key pair is a misconfiguration, not a keyless
    # entry — fail loudly before s3a fails obscurely.
    if bool(cfg.aws_access_key_id) != bool(cfg.aws_secret_access_key):
        missing = (
            "aws_secret_access_key" if cfg.aws_access_key_id else "aws_access_key_id"
        )
        raise ValueError(
            f"S3 config for bucket {cfg.bucket_name!r} sets one half of a "
            f"static key pair but not {missing}"
        )
    # A session token alone pins TemporaryAWSCredentialsProvider, which
    # needs the key pair too — in pinned (non-chain) mode that's a
    # guaranteed opaque s3a failure at first read, so fail at config
    # time instead. In chain mode the provider list falls through to
    # env/instance credentials, so a token-only entry is survivable.
    if (
        cfg.aws_session_token
        and not cfg.aws_access_key_id
        and not cfg.use_credential_chain
    ):
        raise ValueError(
            f"S3 config for bucket {cfg.bucket_name!r} sets aws_session_token "
            "without the static key pair (required by the temporary-credential "
            "provider); add the key pair or enable use_credential_chain"
        )
    has_static = bool(
        cfg.aws_access_key_id or cfg.aws_secret_access_key or cfg.aws_session_token
    )
    if cfg.use_credential_chain:
        chain = [
            "com.amazonaws.auth.EnvironmentVariableCredentialsProvider",
            "com.amazonaws.auth.WebIdentityTokenCredentialsProvider",
            "org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider",
        ]
        if has_static:
            chain.insert(0, static_provider)
        out[f"{pre}.aws.credentials.provider"] = ",".join(chain)
    elif has_static:
        out[f"{pre}.aws.credentials.provider"] = static_provider
    if cfg.aws_endpoint:
        out[f"{pre}.endpoint"] = cfg.aws_endpoint
        # Custom endpoints (minio et al.) address buckets by path.
        out[f"{pre}.path.style.access"] = "true"
    if cfg.aws_default_region:
        out[f"{pre}.endpoint.region"] = cfg.aws_default_region
    if cfg.aws_allow_http is not None:
        out[f"{pre}.connection.ssl.enabled"] = str(not cfg.aws_allow_http).lower()
    return out


def resolve_hf_url(url: str, configs: list[HuggingFaceConfig]) -> str:
    """``hf://org-repo/path`` → the hub's stable HTTPS resolve URL.

    The reference munges repo_id '/' to '-' when forming the store URL
    (huggingface.rs:79-90: 'huggingfacetb/finemath' serves
    'hf://huggingfacetb-finemath/...'); the reverse mapping here finds
    the registered config whose munged repo_id matches the URL host.
    """
    if not url.startswith("hf://"):
        raise ValueError(f"not an hf:// URL: {url!r}")
    rest = url[len("hf://") :]
    host, _, path = rest.partition("/")
    for cfg in configs:
        if cfg.repo_id.replace("/", "-") == host:
            root = (cfg.root.strip("/") + "/") if cfg.root else ""
            return (
                f"https://huggingface.co/{cfg.repo_type}/{cfg.repo_id}"
                f"/resolve/{cfg.revision}/{root}{path}"
            )
    raise ValueError(f"no registered huggingface store for {host!r}")


def register_object_stores(spark: SparkSession, config: ObjectStoreConfig) -> list[str]:
    """Land every configured store on the session; return registered URLs.

    S3 entries become live s3a conf (effective for subsequent reads —
    Hadoop conf is read per-filesystem-instance creation). HuggingFace
    entries are recorded on the session so ``read_hf`` / URL-table SQL
    can resolve ``hf://`` paths; the actual fetch requires network.
    """
    urls: list[str] = []
    for s3 in config.s3:
        for k, v in s3_conf_entries(s3).items():
            # SparkSession.conf rejects some core keys post-start; the
            # hadoopConfiguration route applies unconditionally.
            spark.sparkContext._jsc.hadoopConfiguration().set(
                k.removeprefix("spark.hadoop."), v
            )
            spark.conf.set(k, v)
        urls.append(s3.object_store_url or f"s3://{s3.bucket_name}")
    if config.huggingface:
        hf_registry = getattr(spark, "_dft_hf_stores", None) or []
        hf_registry.extend(config.huggingface)
        spark._dft_hf_stores = hf_registry
        urls.extend(f"hf://{c.repo_id.replace('/', '-')}" for c in config.huggingface)
    return urls
