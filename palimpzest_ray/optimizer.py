"""Validator-lite sample-driven plan optimization (reference parity).

The reference's flagship loop — ``Dataset.optimize_and_run`` (reference
``core/data/dataset.py:682-723``) — samples a few inputs, runs every
candidate physical configuration of each semantic operator on them,
scores the outputs with a ``Validator`` (``validator/validator.py:26-52``
— pluggable per-record ``*_score_fn`` callbacks), turns the per-record
scores into per-operator (cost, time, quality) estimates
(``query/optimizer/cost_model.py:46-146`` ``SampleBasedCostModel``:
quality = mean of non-None record scores), combines them into plan
costs (``core/models.py:969-989`` ``PlanCost``: cost and time ADD,
quality MULTIPLIES) and picks the winner under a ``Policy``
(``policy.py:1-344``; selection protocol
``query/optimizer/optimizer_strategy.py:119-139``: drop
constraint-violating plans only when at least one plan satisfies the
constraint, then a linear ``policy.choose`` scan keeps the winner).

This module re-expresses that DETERMINISTIC core without live LLMs:

- ``Policy`` and its seven concrete classes mirror the reference's
  ``constraint``/``choose`` semantics exactly (strict inequalities,
  the same tie-break chains).
- ``Validator`` keeps the reference's score-fn shapes;
  ``LabeledValidator`` is the deterministic batteries-included
  implementation (field match vs a labels table).
- ``optimize`` evaluates each stage's candidates on a bounded input
  sample DRIVER-SIDE through the same render/parse kernels the
  distributed stages use (`stages/semantic.py` ``_render`` /
  ``_parse_fields`` / ``SemanticFilter.TRUE``), so the sampled
  behavior is the production behavior. Downstream stages are sampled
  on the max-quality upstream candidate's outputs — the reference
  sentinel strategy's exact convention
  (``mab_execution_strategy.py:662-691`` ``_get_max_quality_op``).
- ``optimize_and_run`` then executes the CHOSEN configuration
  distributed, via the ordinary ``sem_map`` / ``sem_filter`` Ray Data
  actor-pool stages over the full input.

Scale note: the sampling phase touches ``sample_size`` rows × k
candidates (driver-side, tiny by construction — it exists to pick a
config, not to process data); the chosen plan streams through Ray Data
actor pools exactly like any other semantic pipeline, so the 100-TB
path is unchanged.
"""

from __future__ import annotations

import time as _time
from collections.abc import Callable
from dataclasses import dataclass, field

import pyarrow as pa
import ray.data as rd

from palimpzest_ray.stages.semantic import (
    SemanticFilter,
    _parse_fields,
    _render,
    sem_filter,
    sem_flat_map,
    sem_map,
)

GeneratorFn = Callable[[list[str]], list[str]]


# ---------------------------------------------------------------------------
# PlanCost (reference core/models.py:868-989)
# ---------------------------------------------------------------------------


@dataclass
class PlanCost:
    """(cost, time, quality) of an operator or (sub)plan. Combination
    follows reference ``PlanCost.__iadd__`` (models.py:969-977): cost
    and time ADD, quality MULTIPLIES."""

    cost: float = 0.0
    time: float = 0.0
    quality: float = 1.0

    def combine(self, other: "PlanCost") -> "PlanCost":
        return PlanCost(
            cost=self.cost + other.cost,
            time=self.time + other.time,
            quality=self.quality * other.quality,
        )


# ---------------------------------------------------------------------------
# Policies (reference policy.py:1-344; same constraint/choose semantics)
# ---------------------------------------------------------------------------


class Policy:
    """``constraint(plan_cost) -> bool`` and ``choose(a, b) -> bool``
    (True = ``a`` is better). Reference policy.py:64-105."""

    def get_primary_metric(self) -> str:
        raise NotImplementedError

    def constraint(self, plan: PlanCost) -> bool:
        raise NotImplementedError

    def choose(self, plan: PlanCost, other: PlanCost) -> bool:
        raise NotImplementedError


class MaxQuality(Policy):
    """Higher quality wins; cost then time break ties
    (reference policy.py:113-143)."""

    def __str__(self):
        return "Maximum Quality"

    def get_primary_metric(self) -> str:
        return "quality"

    def constraint(self, plan: PlanCost) -> bool:
        return True

    def choose(self, plan: PlanCost, other: PlanCost) -> bool:
        if plan.quality == other.quality:
            if plan.cost == other.cost:
                return plan.time < other.time
            return plan.cost < other.cost
        return plan.quality > other.quality


class MinCost(Policy):
    """Lower cost wins; quality then time break ties
    (reference policy.py:146-175)."""

    def __str__(self):
        return "Minimum Cost"

    def get_primary_metric(self) -> str:
        return "cost"

    def constraint(self, plan: PlanCost) -> bool:
        return True

    def choose(self, plan: PlanCost, other: PlanCost) -> bool:
        if plan.cost == other.cost:
            if plan.quality == other.quality:
                return plan.time < other.time
            return plan.quality > other.quality
        return plan.cost < other.cost


class MinTime(Policy):
    """Lower runtime wins; quality then cost break ties
    (reference policy.py:178-207)."""

    def __str__(self):
        return "Minimum Time"

    def get_primary_metric(self) -> str:
        return "time"

    def constraint(self, plan: PlanCost) -> bool:
        return True

    def choose(self, plan: PlanCost, other: PlanCost) -> bool:
        if plan.time == other.time:
            if plan.quality == other.quality:
                return plan.cost < other.cost
            return plan.quality > other.quality
        return plan.time < other.time


class MaxQualityAtFixedCost(Policy):
    """Max quality subject to ``cost < max_cost`` (strict — reference
    policy.py:210-240)."""

    def __init__(self, max_cost: float):
        self.max_cost = max_cost

    def __str__(self):
        return "MaxQuality@FixedCost"

    def get_primary_metric(self) -> str:
        return "quality"

    def constraint(self, plan: PlanCost) -> bool:
        return plan.cost < self.max_cost

    def choose(self, plan: PlanCost, other: PlanCost) -> bool:
        if plan.quality == other.quality:
            if plan.cost == other.cost:
                return plan.time < other.time
            return plan.cost < other.cost
        return plan.quality > other.quality


class MaxQualityAtFixedTime(Policy):
    """Max quality subject to ``time < max_time`` (reference
    policy.py:243-273)."""

    def __init__(self, max_time: float):
        self.max_time = max_time

    def __str__(self):
        return "MaxQuality@FixedTime"

    def get_primary_metric(self) -> str:
        return "quality"

    def constraint(self, plan: PlanCost) -> bool:
        return plan.time < self.max_time

    def choose(self, plan: PlanCost, other: PlanCost) -> bool:
        if plan.quality == other.quality:
            if plan.time == other.time:
                return plan.cost < other.cost
            return plan.time < other.time
        return plan.quality > other.quality


class MinCostAtFixedQuality(Policy):
    """Min cost subject to ``quality > min_quality`` (strict —
    reference policy.py:276-306)."""

    def __init__(self, min_quality: float):
        self.min_quality = min_quality

    def __str__(self):
        return "MinCost@FixedQuality"

    def get_primary_metric(self) -> str:
        return "cost"

    def constraint(self, plan: PlanCost) -> bool:
        return plan.quality > self.min_quality

    def choose(self, plan: PlanCost, other: PlanCost) -> bool:
        if plan.cost == other.cost:
            if plan.quality == other.quality:
                return plan.time < other.time
            return plan.quality > other.quality
        return plan.cost < other.cost


class MinTimeAtFixedQuality(Policy):
    """Min time subject to ``quality > min_quality`` (reference
    policy.py:309-344)."""

    def __init__(self, min_quality: float):
        self.min_quality = min_quality

    def __str__(self):
        return "MinTime@FixedQuality"

    def get_primary_metric(self) -> str:
        return "time"

    def constraint(self, plan: PlanCost) -> bool:
        return plan.quality > self.min_quality

    def choose(self, plan: PlanCost, other: PlanCost) -> bool:
        if plan.time == other.time:
            if plan.quality == other.quality:
                return plan.cost < other.cost
            return plan.quality > other.quality
        return plan.time < other.time


def construct_policy_from_kwargs(**kwargs) -> Policy | None:
    """The reference's keyword sugar (policy.py:8-61): exactly one of
    ``max_quality`` / ``min_cost`` / ``min_time``, at most one of
    ``cost_budget`` / ``time_budget`` / ``quality_threshold``."""
    objectives = ["max_quality", "min_cost", "min_time"]
    constraints = ["cost_budget", "time_budget", "quality_threshold"]
    n_obj = sum(bool(kwargs.get(k, False)) for k in objectives)
    n_con = sum(bool(kwargs.get(k, False)) for k in constraints)
    if n_obj == 0 and n_con == 0:
        return None
    assert n_obj == 1, (
        "Must optimize for one of max_quality, min_cost, or min_time."
    )
    assert n_con <= 1, "At most one constraint is supported."
    if "max_quality" in kwargs and "cost_budget" in kwargs:
        return MaxQualityAtFixedCost(kwargs["cost_budget"])
    if "max_quality" in kwargs and "time_budget" in kwargs:
        return MaxQualityAtFixedTime(kwargs["time_budget"])
    if "max_quality" in kwargs:
        return MaxQuality()
    if "min_cost" in kwargs and "quality_threshold" in kwargs:
        return MinCostAtFixedQuality(kwargs["quality_threshold"])
    if "min_cost" in kwargs:
        return MinCost()
    if "min_time" in kwargs and "quality_threshold" in kwargs:
        return MinTimeAtFixedQuality(kwargs["quality_threshold"])
    return MinTime()


# ---------------------------------------------------------------------------
# Validator (reference validator/validator.py:26-52 score-fn shapes)
# ---------------------------------------------------------------------------


class Validator:
    """Scores one operator output per record; ``None`` = abstain (the
    record contributes nothing to the operator's quality estimate —
    reference cost_model.py:139-146 drops None before the mean). The
    five score-fn shapes mirror reference validator.py:38-52."""

    def map_score_fn(
        self, fields: list[str], input_record: dict, output: dict
    ) -> float | None:
        raise NotImplementedError("Validator.map_score_fn not implemented.")

    def flat_map_score_fn(
        self, fields: list[str], input_record: dict, output: list[dict]
    ) -> float | None:
        raise NotImplementedError(
            "Validator.flat_map_score_fn not implemented."
        )

    def filter_score_fn(
        self, filter_str: str, input_record: dict, output: bool
    ) -> float | None:
        raise NotImplementedError(
            "Validator.filter_score_fn not implemented."
        )

    def join_score_fn(
        self, condition: str, left_input_record: dict,
        right_input_record: dict, output: bool,
    ) -> float | None:
        raise NotImplementedError(
            "Validator.join_score_fn not implemented."
        )

    def topk_score_fn(
        self, fields: list[str], input_record: dict, output: dict
    ) -> float | None:
        raise NotImplementedError(
            "Validator.topk_score_fn not implemented."
        )


class LabeledValidator(Validator):
    """Deterministic validator over a labels table: ``labels`` maps the
    value of ``key_field`` to {field: expected} for map stages and/or
    to the expected boolean under ``filter_str`` for filter stages
    (store it at ``labels[key][filter_str]``). Map score = fraction of
    requested fields whose generated value string-equals the label
    (the reference's judge averages per-field 0/1 evaluations —
    validator.py:102-108); filter score = 1.0 on bool match else 0.0.
    Unlabeled records abstain (None)."""

    def __init__(self, labels: dict, key_field: str,
                 join_labels: dict | None = None):
        self.labels = labels
        self.key_field = key_field
        self.join_labels = join_labels or {}

    def map_score_fn(self, fields, input_record, output):
        lab = self.labels.get(input_record.get(self.key_field))
        if lab is None:
            return None
        scored = [f for f in fields if f in lab]
        if not scored:
            return None
        return sum(
            1.0 for f in scored if str(output.get(f)) == str(lab[f])
        ) / len(scored)

    def filter_score_fn(self, filter_str, input_record, output):
        lab = self.labels.get(input_record.get(self.key_field))
        if lab is None or filter_str not in lab:
            return None
        return 1.0 if bool(output) == bool(lab[filter_str]) else 0.0

    def flat_map_score_fn(self, fields, input_record, output):
        """Expected = ``labels[key][field]`` as a LIST per field; score
        = matched (record, field) pairs over max(expected, produced)
        records — the reference judge's mean-over-all-qualities with a
        length penalty for over/under-production
        (validator.py:139-145)."""
        lab = self.labels.get(input_record.get(self.key_field))
        if lab is None:
            return None
        scored = [f for f in fields if f in lab]
        if not scored:
            return None
        n_exp = max((len(lab[f]) for f in scored), default=0)
        n = max(n_exp, len(output))
        if n == 0:
            return 1.0  # correctly produced nothing
        total = 0.0
        for f in scored:
            exp = list(lab[f])
            for i in range(min(len(exp), len(output))):
                if str(output[i].get(f)) == str(exp[i]):
                    total += 1.0
        return total / (n * len(scored))

    def join_score_fn(self, condition, left_input_record,
                      right_input_record, output):
        """Expected = ``join_labels[(lkey, rkey)][condition]`` (set via
        the ``join_labels=`` constructor kwarg)."""
        key = (
            left_input_record.get(self.key_field),
            right_input_record.get(self.key_field),
        )
        lab = self.join_labels.get(key)
        if lab is None or condition not in lab:
            return None
        return 1.0 if bool(output) == bool(lab[condition]) else 0.0

    def topk_score_fn(self, fields, input_record, output):
        """Retrieval quality as mean per-field F1 between the produced
        list and the labeled relevant set (the reference's stated
        scoring intent for TopK ops — validator.py:229 'score each
        item based on relevance; compute F1'). Scalar labels fall back
        to the map score."""
        lab = self.labels.get(input_record.get(self.key_field))
        if lab is None:
            return None
        scored = [f for f in fields if f in lab]
        if not scored:
            return None
        total = 0.0
        for f in scored:
            exp, got = lab[f], output.get(f)
            if not isinstance(exp, (list, tuple, set)):
                total += 1.0 if str(got) == str(exp) else 0.0
                continue
            got_set = set(got or [])
            exp_set = set(exp)
            if not exp_set and not got_set:
                total += 1.0
                continue
            tp = len(got_set & exp_set)
            prec = tp / len(got_set) if got_set else 0.0
            rec = tp / len(exp_set) if exp_set else 0.0
            total += (
                2 * prec * rec / (prec + rec) if prec + rec else 0.0
            )
        return total / len(scored)


# ---------------------------------------------------------------------------
# Candidate configurations over semantic stages
# ---------------------------------------------------------------------------


@dataclass
class SemCandidate:
    """One physical configuration of a semantic stage — the analogue of
    the reference's per-logical-op physical operator variants (model ×
    prompt strategy). ``cost_per_call`` / ``time_per_call`` are the
    declared per-LLM-call prices used when the generator does not
    expose measured usage (mock/rule generators); a generator with a
    ``get_usage()`` (``generators.OpenAIChatGenerator``) overrides
    both with measured ``cost_usd`` / ``wall_s``."""

    name: str
    generator_factory: Callable[[], GeneratorFn]
    cost_per_call: float = 0.0
    time_per_call: float = 0.0


@dataclass
class SemStage:
    """One logical semantic operator with its candidate set. ``kind``
    is ``"map"`` (generate ``fields`` from ``template``),
    ``"flat_map"`` (ONE_TO_MANY — a JSON list of records per input) or
    ``"filter"`` (NL predicate; ``filter_str`` names it for the
    validator, defaulting to the template), ``"join"`` (right_table +
    per-pair NL condition) or ``"topk"`` (1:1 retrieval whose
    list-valued fields are scored by ``topk_score_fn`` F1 — a
    retrieval config rides the generator callable, e.g. an index
    probe wrapped in ``mock_generator``)."""

    kind: str
    template: str
    fields: list[str] | None = None
    filter_str: str | None = None
    candidates: list[SemCandidate] = field(default_factory=list)
    #: join stages only: the (small) right side — the reference's
    #: JoinOp shape, one NL condition over every (left, right) pair.
    #: Template sees ``{row}`` / ``{right}`` exactly as sem_join.
    right_table: pa.Table | None = None
    right_prefix: str = "right_"
    #: columns this stage READS (the reference sem_filter/sem_map
    #: ``depends_on`` convention, dataset.py sem_filter signature);
    #: None = inferred from the template's {placeholders}. Governs the
    #: admissible stage orderings under optimize(reorder=True).
    depends_on: list[str] | None = None

    def __post_init__(self):
        assert self.kind in (
            "map", "flat_map", "filter", "join", "topk"
        ), self.kind
        if self.kind in ("map", "flat_map", "topk"):
            assert self.fields, f"{self.kind} stage needs fields"
        if self.kind == "join":
            assert self.right_table is not None, "join stage needs right_table"
        if self.filter_str is None:
            self.filter_str = self.template
        assert self.candidates, "stage needs at least one candidate"


@dataclass
class CandidateStats:
    """Per-(stage, candidate) sample estimates — the analogue of one
    row of the reference ``SampleBasedCostModel`` operator matrix
    (cost_model.py:118-146)."""

    stage_index: int
    name: str
    n_inputs: int
    n_outputs: int
    n_scored: int
    quality: float          # mean of non-None scores (1.0 if none)
    cost_per_record: float
    time_per_record: float
    selectivity: float      # n_outputs / n_inputs (1.0 for maps)
    score_sum: float = 0.0  # exact numerator (n_correct for 0/1 fns)


def _run_candidate_on_sample(
    stage: SemStage, cand: SemCandidate, rows: list[dict],
    validator: Validator,
) -> tuple[CandidateStats, list[dict]]:
    """Drive one candidate over the sampled rows through the SAME
    render/parse kernels the distributed stages use, score each record,
    and return (stats, surviving/augmented rows)."""
    import json as _json

    gen = cand.generator_factory()
    if stage.kind == "join":
        right_rows = stage.right_table.to_pylist()
        pairs = [(lr, rr) for lr in rows for rr in right_rows]
        prompts = [
            stage.template.format(
                row=_json.dumps(lr, default=str, sort_keys=True),
                right=_json.dumps(rr, default=str, sort_keys=True),
            )
            for lr, rr in pairs
        ]
    else:
        prompts = [_render(stage.template, r) for r in rows]
    t0 = _time.monotonic()
    outs = gen(prompts)
    wall = _time.monotonic() - t0

    scores: list[float] = []
    out_rows: list[dict] = []
    if stage.kind in ("map", "topk"):
        score_fn = (
            validator.topk_score_fn if stage.kind == "topk"
            else validator.map_score_fn
        )
        for r, o in zip(rows, outs):
            parsed = _parse_fields(o, stage.fields)
            s = score_fn(stage.fields, r, parsed)
            if s is not None:
                scores.append(s)
            out_rows.append({**r, **parsed})
    elif stage.kind == "flat_map":
        from palimpzest_ray.stages.semantic import _parse_fields_list

        for r, o in zip(rows, outs):
            parsed = _parse_fields_list(o, stage.fields)
            s = validator.flat_map_score_fn(stage.fields, r, parsed)
            if s is not None:
                scores.append(s)
            out_rows.extend({**r, **d} for d in parsed)
    elif stage.kind == "join":
        for (lr, rr), o in zip(pairs, outs):
            keep = str(o).strip().lower() in SemanticFilter.TRUE
            s = validator.join_score_fn(stage.filter_str, lr, rr, keep)
            if s is not None:
                scores.append(s)
            if keep:
                merged = dict(lr)
                for k, v in rr.items():  # sem_join's merge discipline
                    merged[
                        stage.right_prefix + k if k in merged else k
                    ] = v
                out_rows.append(merged)
    else:
        for r, o in zip(rows, outs):
            keep = str(o).strip().lower() in SemanticFilter.TRUE
            s = validator.filter_score_fn(stage.filter_str, r, keep)
            if s is not None:
                scores.append(s)
            if keep:
                out_rows.append(r)

    n = max(len(rows), 1)
    usage = gen.get_usage() if hasattr(gen, "get_usage") else None
    # joins make |rows| x |right| calls; cost/time stay normalized
    # per INPUT record (the right-side multiplier is the join's cost)
    cost = (
        usage["cost_usd"] if usage is not None
        else cand.cost_per_call * len(prompts)
    )
    t = (
        usage["wall_s"] if usage is not None and usage.get("wall_s")
        else (cand.time_per_call * len(prompts) or wall)
    )
    stats = CandidateStats(
        stage_index=-1,
        name=cand.name,
        n_inputs=len(rows),
        n_outputs=len(out_rows),
        n_scored=len(scores),
        quality=(sum(scores) / len(scores)) if scores else 1.0,
        cost_per_record=cost / n,
        time_per_record=t / n,
        # filters shrink, flat_maps fan out — both scale downstream
        # per-record cost (reference cost_model selectivity matrix)
        selectivity=(
            1.0 if stage.kind in ("map", "topk")
            else len(out_rows) / n
        ),
        score_sum=sum(scores),
    )
    return stats, out_rows


def pareto_frontier(plans: list[PlanCost]) -> list[int]:
    """Indices of the non-dominated plans. ``a`` dominates ``b`` when
    ``a.cost <= b.cost``, ``a.time <= b.time``, ``a.quality >=
    b.quality`` with at least one strict inequality (the reference's
    pareto filter over (cost, time, quality),
    optimizer_strategy.py:66-118). Ties on all three keep both."""
    keep: list[int] = []
    for i, b in enumerate(plans):
        dominated = any(
            a.cost <= b.cost and a.time <= b.time
            and a.quality >= b.quality
            and (a.cost < b.cost or a.time < b.time
                 or a.quality > b.quality)
            for j, a in enumerate(plans) if j != i
        )
        if not dominated:
            keep.append(i)
    return keep


@dataclass
class OptimizeResult:
    chosen: list[str]               # candidate name per EXECUTED stage
    plan_cost: PlanCost             # sample-estimated, per input record
    stats: list[list[CandidateStats]]  # [stage][candidate], exec order
    policy: str
    #: execution order as indices into the INPUT stages list (identity
    #: unless reorder=True moved an independent stage, e.g. a filter
    #: pushed below an expensive convert)
    order: list[int] = field(default_factory=list)


def _generated_fields(stage: SemStage) -> set:
    if stage.kind in ("map", "flat_map", "topk"):
        return set(stage.fields)
    if stage.kind == "join":
        return set(stage.right_table.column_names)
    return set()


def _stage_deps(stage: SemStage) -> set:
    """Columns a stage reads: the explicit ``depends_on`` (the
    reference ``sem_filter(depends_on=...)`` convention) or the
    template's placeholder names (``{row}``/``{right}`` excluded —
    they expand to the whole record, which would pin every order)."""
    if stage.depends_on is not None:
        return set(stage.depends_on)
    import string as _string

    return {
        fn.split(".")[0].split("[")[0]
        for _, fn, _, _ in _string.Formatter().parse(stage.template)
        if fn
    } - {"row", "right"}


def _admissible_orders(stages: list[SemStage], cap: int = 24) -> list[list[int]]:
    """Topological orders of the stage dependency DAG (stage j must
    follow stage i when i generates a field j depends on) — the
    deterministic analogue of the reference's PushDownFilter /
    ReorderConverts transformation rules (rules.py:108, 245), with
    measured selectivities doing the costing instead of heuristics.
    NOTE: a template that renders the whole record (``{row}``) depends
    on everything upstream generates — declare ``depends_on=[]``
    explicitly to mark such a stage order-independent. Capped at
    ``cap`` orders (exhaustive for <= 4 free stages)."""
    n = len(stages)
    gen = [_generated_fields(s) for s in stages]
    dep = [_stage_deps(s) for s in stages]
    preds = {
        j: {i for i in range(n) if i != j and (gen[i] & dep[j])}
        for j in range(n)
    }
    orders: list[list[int]] = []

    def rec(prefix: list[int], remaining: set):
        if len(orders) >= cap:
            return
        if not remaining:
            orders.append(list(prefix))
            return
        for j in sorted(remaining):
            if preds[j] <= set(prefix):
                prefix.append(j)
                remaining.discard(j)
                rec(prefix, remaining)
                remaining.add(j)
                prefix.pop()

    rec([], set(range(n)))
    return orders or [list(range(n))]


def _evaluate_ordering(
    sample_rows: list[dict], stages: list[SemStage], validator: Validator
) -> tuple[list[list[CandidateStats]], list[tuple[list[int], PlanCost]]]:
    """Evaluate one stage ordering on the sample: per-candidate stats
    (downstream fed by the max-quality upstream candidate — reference
    ``_get_max_quality_op``, mab_execution_strategy.py:662-691) and
    the cartesian combo enumeration (cost/time scaled by the combo's
    own upstream selectivity chain, quality multiplies —
    models.py:969-977)."""
    all_stats: list[list[CandidateStats]] = []
    rows = sample_rows
    for si, stage in enumerate(stages):
        stage_stats: list[CandidateStats] = []
        outputs: list[list[dict]] = []
        for cand in stage.candidates:
            st, out = _run_candidate_on_sample(stage, cand, rows, validator)
            st.stage_index = si
            stage_stats.append(st)
            outputs.append(out)
        all_stats.append(stage_stats)
        # feed downstream with the max-quality candidate's outputs
        # (ties: lower cost, then lower time, then declaration order)
        best_i = 0
        for i in range(1, len(stage_stats)):
            a, b = stage_stats[i], stage_stats[best_i]
            if (a.quality, -a.cost_per_record, -a.time_per_record) > (
                b.quality, -b.cost_per_record, -b.time_per_record
            ):
                best_i = i
        rows = outputs[best_i]

    combos: list[tuple[list[int], PlanCost]] = [([], PlanCost())]
    for si, stage_stats in enumerate(all_stats):
        nxt: list[tuple[list[int], PlanCost]] = []
        for picks, pc in combos:
            sel = 1.0
            for sj, pick in enumerate(picks):
                sel *= all_stats[sj][pick].selectivity
            for ci, st in enumerate(stage_stats):
                nxt.append((
                    picks + [ci],
                    pc.combine(PlanCost(
                        cost=st.cost_per_record * sel,
                        time=st.time_per_record * sel,
                        quality=st.quality,
                    )),
                ))
        combos = nxt
    return all_stats, combos


def optimize(
    sample_rows: list[dict] | pa.Table,
    stages: list[SemStage],
    validator: Validator,
    policy: Policy,
    *,
    reorder: bool = False,
) -> OptimizeResult:
    """Sample-driven config choice. Evaluates every candidate of every
    stage on the sample, enumerates the cartesian product of per-stage
    candidates into plan costs and selects under ``policy`` with the
    reference protocol (optimizer_strategy.py:129-139):
    constraint-violating plans are dropped only when at least one plan
    satisfies the constraint, then a linear ``choose`` scan keeps the
    winner. ``reorder=True`` additionally searches the admissible
    stage orderings (dependency-respecting topological orders — the
    PushDownFilter/ReorderConverts analogue, rules.py:108/245) and the
    winner carries its execution ``order``."""
    if isinstance(sample_rows, pa.Table):
        sample_rows = sample_rows.to_pylist()
    orders = (
        _admissible_orders(stages) if reorder
        else [list(range(len(stages)))]
    )
    # evaluate each ordering; pareto-filter its combos (reference
    # ParetoStrategy, optimizer_strategy.py:66-139 — never changes the
    # winner, bounds the candidate set), then select globally
    plans: list[tuple[list[int], list[int], PlanCost]] = []
    stats_by_order: dict[tuple, list] = {}
    for order in orders:
        perm = [stages[i] for i in order]
        all_stats, combos = _evaluate_ordering(
            sample_rows, perm, validator
        )
        stats_by_order[tuple(order)] = all_stats
        keep = pareto_frontier([pc for _, pc in combos])
        plans.extend(
            (order, combos[i][0], combos[i][1]) for i in keep
        )
    if any(policy.constraint(pc) for _, _, pc in plans):
        plans = [p for p in plans if policy.constraint(p[2])]
    best = plans[0]
    for p in plans[1:]:
        if not policy.choose(best[2], p[2]):
            best = p
    best_order, best_picks, best_pc = best
    return OptimizeResult(
        chosen=[
            stages[best_order[pos]].candidates[ci].name
            for pos, ci in enumerate(best_picks)
        ],
        plan_cost=best_pc,
        stats=stats_by_order[tuple(best_order)],
        policy=str(policy),
        order=list(best_order),
    )


def optimize_and_run(
    ds: rd.Dataset,
    stages: list[SemStage],
    validator: Validator | None = None,
    policy: Policy | None = None,
    *,
    train_dataset=None,
    sample_size: int = 32,
    concurrency=(1, 4),
    batch_size: int = 64,
    reorder: bool = False,
    **policy_kwargs,
) -> tuple[rd.Dataset, OptimizeResult]:
    """Reference ``Dataset.optimize_and_run`` (dataset.py:682-723):
    choose the per-stage config on a bounded sample, then run the
    chosen configuration DISTRIBUTED over the full input via the
    ordinary ``sem_map`` / ``sem_filter`` actor-pool stages.

    The sample is ``train_dataset`` when given (the reference's
    labeled-training-input convention — a ``ray.data.Dataset``,
    ``pa.Table`` or list of row dicts), else the first ``sample_size``
    rows of ``ds`` (deterministic — pass a pre-shuffled dataset for a
    random sample). At least one of ``train_dataset`` / ``validator``
    must be provided (dataset.py:689-692); policy keyword sugar
    (``max_quality=True``, ``min_cost=True, quality_threshold=0.8``,
    ...) is accepted in place of an explicit ``policy``
    (``construct_policy_from_kwargs``, the reference ``run()``
    convention)."""
    assert train_dataset is not None or validator is not None, (
        "Must provide at least one of train_dataset or validator to "
        "use optimize_and_run()"
    )
    if validator is None:
        raise NotImplementedError(
            "the default LLM-judge Validator is out of scope "
            "(SURVEY §2.4) — pass a Validator (e.g. LabeledValidator)"
        )
    if policy is None:
        policy = construct_policy_from_kwargs(**policy_kwargs) or MaxQuality()
    if train_dataset is None:
        sample = pa.Table.from_pylist(ds.limit(sample_size).take_all())
    elif isinstance(train_dataset, pa.Table):
        sample = train_dataset
    elif isinstance(train_dataset, list):
        sample = pa.Table.from_pylist(train_dataset)
    else:  # a ray.data.Dataset (or engine Dataset wrapper)
        inner = getattr(train_dataset, "_ds", train_dataset)
        sample = pa.Table.from_pylist(inner.take_all())
    result = optimize(sample, stages, validator, policy, reorder=reorder)
    out = ds
    exec_stages = [stages[i] for i in result.order]
    for stage, name in zip(exec_stages, result.chosen):
        cand = next(c for c in stage.candidates if c.name == name)
        if stage.kind in ("map", "topk"):
            out = sem_map(
                out, stage.fields, stage.template,
                cand.generator_factory,
                concurrency=concurrency, batch_size=batch_size,
                image_fields=[],
            )
        elif stage.kind == "flat_map":
            out = sem_flat_map(
                out, stage.fields, stage.template,
                cand.generator_factory,
                concurrency=concurrency, batch_size=batch_size,
                image_fields=[],
            )
        elif stage.kind == "join":
            from palimpzest_ray.stages.semantic import sem_join

            out = sem_join(
                out, stage.right_table, stage.template,
                cand.generator_factory,
                right_prefix=stage.right_prefix,
                concurrency=concurrency, batch_size=batch_size,
            )
        else:
            out = sem_filter(
                out, stage.template, cand.generator_factory,
                concurrency=concurrency, batch_size=batch_size,
                image_fields=[],
            )
    return out, result
