"""Dictionary-driven classifier with a configurable rule table.

The reference's UserAgent dataprocessor (its single largest component)
matches each record against an ordered rule list loaded from config and
emits a 13-field classification, several of which are EXTRACTED from
the matched string (agent version, language, OS version) rather than
constant per rule (UserAgent.java:44-59, tuple-splitter FSM 450-596;
UserAgentConfig.java:34-430 — behavior studied, not ported).
Spark-first this becomes rules AS DATA with two interchangeable
execution strategies:

- ``classify_expr``: the rule list is compiled into one generated
  ``when``-chain Column (first match wins) — whole-stage codegen, zero
  join, the fast path when rules are known at plan time,
- ``classify_join``: the rule table is broadcast and matched with
  ``rlike`` + min-priority pick — the data-driven path when rules live
  in a table that changes without replanning (giraffe's rules-XML
  reload analog).  Extractor patterns ride the rule table as columns
  and are applied with a column-pattern ``regexp_extract``.
- ``classify_scan``: rules as one array<struct> literal, first match
  picked per row with array_min(filter(...)) — rules still data, but
  ZERO shuffles of the fact side (classify_join regroups it twice);
  the fact-scale path.

All strategies are property-tested to agree.

Field mapping onto the reference's 13 outputs: family<-agentName,
version<-agentVersion, language<-agentLanguage, os<-OS,
os_version<-OSVersion, os_distro<-OSDistro, engine<-layoutEngine,
engine_version (replaces Mode: versioned engines subsume the mode
flag), model<-Resolution/device-model, type, device, processor,
sw_platform<-SWPlatform.

Rule field values are either a literal string (constant per rule), the
dict ``{"re": <pattern>}`` (capture group 1 extracted from the UA
string; no match -> null), or absent (null).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

OUT_FIELDS = (
    "family", "version", "language", "os", "os_version", "os_distro",
    "engine", "engine_version", "model", "type", "device", "processor",
    "sw_platform",
)

_VER = r"([0-9][0-9._]*)"
_LANG_RE = r"\[([a-zA-Z]{2}(?:[-_][a-zA-Z]{2})?)\]"

# a compact default rule set exercising priority order (first match
# wins: a Googlebot UA also contains "Android" and must stay a bot)
# and every extractor kind (agent version, language, OS version,
# engine version, device model, processor)
DEFAULT_RULES = [
    {
        "priority": 1, "pattern": "Googlebot",
        "family": "googlebot", "version": {"re": rf"Googlebot/{_VER}"},
        "os": "bot", "device": "bot", "type": "bot", "sw_platform": "web",
    },
    {
        "priority": 2, "pattern": "iPhone",
        "family": "safari_mobile", "version": {"re": rf"Safari/{_VER}"},
        "language": {"re": _LANG_RE},
        "os": "ios", "os_version": {"re": rf"iPhone OS {_VER}"},
        "engine": "webkit", "engine_version": {"re": rf"AppleWebKit/{_VER}"},
        "model": "iphone", "type": "browser", "device": "mobile",
        "processor": "arm", "sw_platform": "web",
    },
    {
        "priority": 3, "pattern": "Android",
        "family": "chrome_mobile", "version": {"re": rf"Chrome/{_VER}"},
        "language": {"re": _LANG_RE},
        "os": "android", "os_version": {"re": rf"Android {_VER}"},
        "os_distro": "linux",
        "engine": "blink", "engine_version": {"re": rf"Chrome/{_VER}"},
        "model": {"re": r"Android [0-9.]+; ([^;)]+)\)"},
        "type": "browser", "device": "mobile", "processor": "arm",
        "sw_platform": "web",
    },
    {
        "priority": 4, "pattern": "Windows NT",
        "family": "chrome", "version": {"re": rf"Chrome/{_VER}"},
        "language": {"re": _LANG_RE},
        "os": "windows", "os_version": {"re": rf"Windows NT {_VER}"},
        "engine": "blink", "engine_version": {"re": rf"Chrome/{_VER}"},
        "type": "browser", "device": "desktop",
        "processor": {"re": r"Win64; (\w+)"}, "sw_platform": "web",
    },
    {
        "priority": 5, "pattern": "Macintosh",
        "family": "safari", "version": {"re": rf"Safari/{_VER}"},
        "language": {"re": _LANG_RE},
        "os": "macos", "os_version": {"re": rf"Mac OS X {_VER}"},
        "engine": "webkit", "engine_version": {"re": rf"AppleWebKit/{_VER}"},
        "type": "browser", "device": "desktop",
        "processor": {"re": r"\((\w+); "}, "sw_platform": "web",
    },
]

UNKNOWN = {"family": "unknown", "os": "unknown", "device": "unknown"}


def _field_col(c: Column, spec) -> Column:
    """One output field from its rule spec: literal, extractor, or null."""
    if spec is None:
        return F.lit(None).cast("string")
    if isinstance(spec, dict):
        return F.nullif(F.regexp_extract(c, spec["re"], 1), F.lit(""))
    return F.lit(spec)


def classify_expr(
    col: Column | str, rules: list[dict] | None = None, unknown: dict | None = None
) -> Column:
    """Generated when-chain: struct of OUT_FIELDS, first match wins."""
    c = F.col(col) if isinstance(col, str) else col
    rules = sorted(rules or DEFAULT_RULES, key=lambda r: r["priority"])
    unknown = unknown or UNKNOWN
    out = None
    for r in rules:
        hit = c.rlike(r["pattern"])
        val = F.struct(
            *[_field_col(c, r.get(f)).alias(f) for f in OUT_FIELDS]
        )
        out = F.when(hit, val) if out is None else out.when(hit, val)
    fallback = F.struct(
        *[F.lit(unknown.get(f)).cast("string").alias(f) for f in OUT_FIELDS]
    )
    return fallback if out is None else out.otherwise(fallback)


def rules_df(spark: SparkSession, rules: list[dict] | None = None) -> DataFrame:
    """Rule table: per field, a literal column `f` and a pattern column
    `f_re` (exactly one non-null when the rule sets the field)."""
    rules = rules or DEFAULT_RULES
    rows = []
    for r in rules:
        row = [r["priority"], r["pattern"]]
        for f in OUT_FIELDS:
            spec = r.get(f)
            if isinstance(spec, dict):
                row += [None, spec["re"]]
            else:
                row += [spec, None]
        rows.append(tuple(row))
    ddl = "priority int, pattern string, " + ", ".join(
        f"{f} string, {f}_re string" for f in OUT_FIELDS
    )
    return spark.createDataFrame(rows, ddl)


def classify_scan(
    df: DataFrame, col: str, rules: list[dict] | None = None,
    unknown: dict | None = None,
) -> DataFrame:
    """Zero-shuffle rules-as-data: the fact-scale classification path.

    The rule list becomes one ``array<struct>`` literal; each row picks
    its first match with ``array_min(filter(rules, r -> ua rlike
    r.pattern))`` — min over (priority, ...) structs IS first-match-
    wins — then extracts capture-group fields from the picked rule's
    patterns.  Two whole-stage-codegen projections, no join, no
    ``monotonically_increasing_id``, and crucially ZERO shuffles of the
    fact table (``classify_join`` regroups it twice; fine at dimension
    scale, wrong for a 100 TB fact scan).  Plan-locked by
    ``test_classify_scan_zero_shuffle``.
    """
    rules = sorted(rules or DEFAULT_RULES, key=lambda r: r["priority"])
    unknown = unknown or UNKNOWN

    def lit_or_null(v):
        return F.lit(v).cast("string")

    arr = F.array(
        *[
            F.struct(
                F.lit(r["priority"]).alias("priority"),
                F.lit(r["pattern"]).alias("pattern"),
                *[
                    x
                    for f in OUT_FIELDS
                    for x in (
                        lit_or_null(
                            None if isinstance(r.get(f), dict) else r.get(f)
                        ).alias(f),
                        lit_or_null(
                            r[f]["re"] if isinstance(r.get(f), dict) else None
                        ).alias(f"{f}_re"),
                    )
                ],
            )
            for r in rules
        ]
    )
    c = F.col(col)
    picked = df.withColumn(
        "_rule",
        F.array_min(F.filter(arr, lambda r: F.regexp_like(c, r.getField("pattern")))),
    )
    out_cols = [
        F.when(
            F.col("_rule").isNotNull(),
            F.coalesce(
                F.col(f"_rule.{f}"),
                F.nullif(F.expr(f"regexp_extract({col}, _rule.{f}_re, 1)"), F.lit("")),
            ),
        )
        .otherwise(F.lit(unknown.get(f)).cast("string"))
        .alias(f)
        for f in OUT_FIELDS
    ]
    return picked.select(*[F.col(x) for x in df.columns], *out_cols)


def classify_join(
    df: DataFrame, col: str, rules: DataFrame, unknown: dict | None = None
) -> DataFrame:
    """Broadcast rule-table match: rlike theta-join + min-priority pick.

    The rule table is tiny (broadcast: each task scans its rows per
    record, like the reference's in-memory rule list); first match =
    min priority via one ``min_by`` aggregate keyed on a row id, so
    input rows are never duplicated downstream.  Extractor patterns are
    data (``f_re`` columns), applied with the column-pattern form of
    ``regexp_extract`` — rules change without replanning.  Scale: cost
    is O(rows x rules) regex work distributed across tasks — identical
    to the reference's per-record rule scan, but sharded.
    """
    unknown = unknown or UNKNOWN
    tagged = df.withColumn("_cid", F.monotonically_increasing_id())
    hits = tagged.join(
        F.broadcast(rules), F.regexp_like(F.col(col), F.col("pattern")), "left"
    )
    vals = [
        F.coalesce(
            F.col(f),
            F.nullif(F.expr(f"regexp_extract({col}, {f}_re, 1)"), F.lit("")),
        ).alias(f)
        for f in OUT_FIELDS
    ]
    pick = F.struct(*vals)
    best = (
        hits.groupBy("_cid")
        .agg(
            F.min_by(pick, F.coalesce(F.col("priority"), F.lit(2**31 - 1))).alias("_cls"),
            F.min(F.col("priority")).alias("_prio"),
        )
    )
    out_cols = [
        F.when(F.col("_prio").isNotNull(), F.col(f"_cls.{f}"))
        .otherwise(F.lit(unknown.get(f)).cast("string"))
        .alias(f)
        for f in OUT_FIELDS
    ]
    return (
        tagged.join(best, "_cid")
        .select(*[F.col(c) for c in df.columns], *out_cols)
    )
