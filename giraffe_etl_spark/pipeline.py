"""Declarative pipeline spec: the process-definition analog.

The reference engine wires a process from an XML document — terminals
(inputs with stream formats + per-field conversion hints, outputs with
error routes), a network of nodes whose task chains call registered
functions, and conditional routes between them (libgiraffe2
resources/xml/process_definitions.xml:18-261, behavior studied, not
ported).  This engine's Python API *is* that wiring; this module adds
the declarative layer on top so a pipeline can live as data (a dict /
JSON document) and compile down to the exact same DataFrame plan the
explicit API produces:

- ``input``          -> TokenizerImporter analog (raw-line parse with a
                        corrupt-record route) or a pre-built DataFrame
- ``convert``        -> conversionHint analog (FieldSpec list; failures
                        either absorbed by defaults or routed)
- ``tasks``          -> dp:node/dp:call analog: a chain of registered
                        vectorized operators (broadcast enrich, rdns,
                        UA classify, ...), each optionally gated by a
                        ``when`` condition (dp:condition analog)
- ``routes``         -> error-route analog: parse failures and
                        conversion errors land in named dead-letter
                        terminals instead of vanishing
- the compiled result is a dict of terminal-name -> DataFrame, all
  lazy: Catalyst still sees one declarative plan per terminal, so
  nothing here costs an extra job or exchange over the explicit API.

Compile-time validation mirrors the reference's ProcessFactory startup
checks: unknown task names, bad field specs and colliding terminal
names fail at ``compile_pipeline`` time, before any data moves.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, functions as F

from .cdc.convert import FieldSpec, convert_typed, split_conversion_errors
from .operators.classify import classify_expr, DEFAULT_RULES
from .operators.enrich import enrich_hosts
from .operators.rdns import resolve_hosts
from .operators.weblog import parse_weblog


# ---- task registry (dp:call analog) ----------------------------------------
#
# A task factory takes the spec's task dict and returns a function
# DataFrame -> DataFrame.  Registered by name exactly like the
# reference resolves dt:class/dt:method through its task registry.

_TASKS: dict[str, Callable[[dict], Callable[[DataFrame], DataFrame]]] = {}


def register_task(name: str):
    def deco(factory):
        _TASKS[name] = factory
        return factory
    return deco


@register_task("enrich_geo")
def _t_enrich_geo(task: dict):
    geo = task["geo"]  # a small dictionary DataFrame (broadcast side)

    def run(df: DataFrame) -> DataFrame:
        return enrich_hosts(df, geo, host_col=task.get("host_col", "host"))

    return run


@register_task("rdns")
def _t_rdns(task: dict):
    def run(df: DataFrame) -> DataFrame:
        return resolve_hosts(
            df, ip_col=task.get("ip_col", "ip"), mode=task.get("mode", "expr")
        )

    return run


@register_task("classify_ua")
def _t_classify_ua(task: dict):
    def run(df: DataFrame) -> DataFrame:
        return df.withColumn(
            task.get("out", "agent_class"),
            classify_expr(
                F.col(task.get("ua_col", "user_agent")),
                rules=task.get("rules", DEFAULT_RULES),
            ),
        )

    return run


@register_task("select")
def _t_select(task: dict):
    exprs = task["exprs"]  # list of SQL expression strings

    def run(df: DataFrame) -> DataFrame:
        return df.selectExpr(*exprs)

    return run


@register_task("with_column")
def _t_with_column(task: dict):
    def run(df: DataFrame) -> DataFrame:
        return df.withColumn(task["name"], F.expr(task["expr"]))

    return run


# ---- compiled pipeline ------------------------------------------------------


@dataclass
class Pipeline:
    name: str
    _input_kind: str
    _input_opts: dict
    _specs: list[FieldSpec]
    _keep: tuple
    _steps: list  # [(task_dict, compiled_fn)]
    _routes: dict
    _output: str
    spec: dict = field(repr=False, default_factory=dict)

    def terminals(self) -> list[str]:
        outs = [self._output]
        outs += [v for v in self._routes.values()]
        return outs

    def run(self, source: DataFrame) -> dict[str, DataFrame]:
        """Compile the terminal plans for one input DataFrame.

        Everything returned is lazy; no action is triggered here.
        """
        out: dict[str, DataFrame] = {}

        # input terminal: raw-line parse with corrupt route
        if self._input_kind == "weblog_lines":
            parsed = parse_weblog(source, col=self._input_opts.get("column", "line"))
            corrupt_to = self._routes.get("corrupt")
            if corrupt_to:
                out[corrupt_to] = parsed.filter(F.col("_corrupt")).select("line")
            cur = parsed.filter(~F.col("_corrupt")).drop("_corrupt")
        elif self._input_kind == "dataframe":
            cur = source
        else:  # validated at compile time
            raise AssertionError(self._input_kind)

        # conversion layer with its error route
        if self._specs:
            converted = convert_typed(cur, self._specs, keep=self._keep)
            ok, bad = split_conversion_errors(converted)
            conv_to = self._routes.get("conversion_errors")
            if conv_to:
                out[conv_to] = bad
            cur = ok

        # node task chain; ``when`` gates a task to matching rows, the
        # rest pass through unchanged (dp:condition analog) — one union
        # of two filters over the same child, no extra scan of source
        for task, fn in self._steps:
            cond = task.get("when")
            if cond is None:
                cur = fn(cur)
            else:
                hit = fn(cur.filter(F.expr(cond)))
                miss = cur.filter(~F.coalesce(F.expr(cond), F.lit(False)))
                for c in hit.columns:
                    if c not in miss.columns:
                        miss = miss.withColumn(c, F.lit(None).cast(hit.schema[c].dataType))
                cur = hit.unionByName(miss)

        out[self._output] = cur
        return out


def compile_pipeline(spec: dict) -> Pipeline:
    """Validate a spec dict and bind its tasks — fail before data moves."""
    name = spec.get("name", "pipeline")
    inp = spec.get("input", {"kind": "dataframe"})
    kind = inp.get("kind", "dataframe")
    if kind not in ("weblog_lines", "dataframe"):
        raise ValueError(f"unknown input kind {kind!r} in process {name!r}")

    specs = [
        FieldSpec(
            name=c["name"], dtype=c["dtype"], source=c.get("source"),
            default=c.get("default"), fmt=c.get("fmt"),
        )
        for c in spec.get("convert", [])
    ]

    steps = []
    for task in spec.get("tasks", []):
        tname = task.get("call")
        if tname not in _TASKS:
            raise ValueError(
                f"unknown task {tname!r} in process {name!r}; "
                f"registered: {sorted(_TASKS)}"
            )
        steps.append((task, _TASKS[tname](task)))

    routes = dict(spec.get("routes", {}))
    output = spec.get("output", "fact")
    terminal_names = [output, *routes.values()]
    if len(set(terminal_names)) != len(terminal_names):
        raise ValueError(f"terminal names collide in process {name!r}: {terminal_names}")

    return Pipeline(
        name=name,
        _input_kind=kind,
        _input_opts=inp,
        _specs=specs,
        _keep=tuple(spec.get("keep", ())),
        _steps=steps,
        _routes=routes,
        _output=output,
        spec=spec,
    )
