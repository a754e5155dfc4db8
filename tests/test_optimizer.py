"""Validator-lite / optimize_and_run (palimpzest_ray.optimizer).

Mirrors the reference's deterministic optimizer semantics: policy
constraint/choose chains (reference policy.py:1-344), PlanCost
combination (models.py:969-989 — cost/time add, quality multiplies),
sample-driven per-op estimates (cost_model.py:118-146 — quality = mean
of non-None scores), max-quality-upstream sampling convention
(mab_execution_strategy.py:662-691) and the selection protocol
(optimizer_strategy.py:129-139 — constraint filter only when
satisfiable, then a linear choose scan)."""

from __future__ import annotations

import json
import re

import pyarrow as pa
import pytest

from palimpzest_ray.optimizer import (
    LabeledValidator,
    MaxQuality,
    MaxQualityAtFixedCost,
    MaxQualityAtFixedTime,
    MinCost,
    MinCostAtFixedQuality,
    MinTime,
    MinTimeAtFixedQuality,
    PlanCost,
    SemCandidate,
    SemStage,
    construct_policy_from_kwargs,
    optimize,
    optimize_and_run,
)
from palimpzest_ray.stages.semantic import mock_generator


# ---- policies -------------------------------------------------------------


def test_policy_choose_and_tiebreaks():
    hi_q = PlanCost(cost=10.0, time=5.0, quality=0.9)
    lo_q = PlanCost(cost=1.0, time=1.0, quality=0.5)
    assert MaxQuality().choose(hi_q, lo_q)
    assert not MaxQuality().choose(lo_q, hi_q)
    assert MinCost().choose(lo_q, hi_q)
    assert MinTime().choose(lo_q, hi_q)
    # tie chains: quality tie -> cost, cost tie -> time (MaxQuality)
    a = PlanCost(cost=2.0, time=9.0, quality=0.9)
    b = PlanCost(cost=2.0, time=1.0, quality=0.9)
    assert MaxQuality().choose(b, a) and not MaxQuality().choose(a, b)
    c = PlanCost(cost=1.0, time=9.0, quality=0.9)
    assert MaxQuality().choose(c, a)
    # MinCost tie -> higher quality wins
    d = PlanCost(cost=2.0, time=9.0, quality=0.95)
    assert MinCost().choose(d, a)


def test_policy_constraints_are_strict():
    pc = PlanCost(cost=5.0, time=5.0, quality=0.8)
    assert not MaxQualityAtFixedCost(5.0).constraint(pc)  # strict <
    assert MaxQualityAtFixedCost(5.01).constraint(pc)
    assert not MaxQualityAtFixedTime(5.0).constraint(pc)
    assert not MinCostAtFixedQuality(0.8).constraint(pc)  # strict >
    assert MinCostAtFixedQuality(0.79).constraint(pc)
    assert MinTimeAtFixedQuality(0.79).constraint(pc)


def test_construct_policy_from_kwargs():
    assert construct_policy_from_kwargs() is None
    assert isinstance(construct_policy_from_kwargs(max_quality=True), MaxQuality)
    assert isinstance(construct_policy_from_kwargs(min_cost=True), MinCost)
    assert isinstance(construct_policy_from_kwargs(min_time=True), MinTime)
    p = construct_policy_from_kwargs(max_quality=True, cost_budget=3.0)
    assert isinstance(p, MaxQualityAtFixedCost) and p.max_cost == 3.0
    p = construct_policy_from_kwargs(min_cost=True, quality_threshold=0.5)
    assert isinstance(p, MinCostAtFixedQuality) and p.min_quality == 0.5
    p = construct_policy_from_kwargs(min_time=True, quality_threshold=0.5)
    assert isinstance(p, MinTimeAtFixedQuality)
    with pytest.raises(AssertionError):
        construct_policy_from_kwargs(max_quality=True, min_cost=True)


def test_plan_cost_combination():
    a = PlanCost(cost=2.0, time=3.0, quality=0.5)
    b = PlanCost(cost=1.0, time=1.0, quality=0.8)
    c = a.combine(b)
    assert (c.cost, c.time, c.quality) == (3.0, 4.0, 0.4)


# ---- validator ------------------------------------------------------------


def test_labeled_validator_scores_and_abstains():
    labels = {
        1: {"lang": "en", "keep: {t}": True},
        2: {"lang": "fr"},
    }
    v = LabeledValidator(labels, "id")
    assert v.map_score_fn(["lang"], {"id": 1}, {"lang": "en"}) == 1.0
    assert v.map_score_fn(["lang"], {"id": 1}, {"lang": "de"}) == 0.0
    assert v.map_score_fn(["lang"], {"id": 99}, {"lang": "en"}) is None
    assert v.map_score_fn(["other"], {"id": 1}, {"other": "x"}) is None
    assert v.filter_score_fn("keep: {t}", {"id": 1}, True) == 1.0
    assert v.filter_score_fn("keep: {t}", {"id": 1}, False) == 0.0
    assert v.filter_score_fn("keep: {t}", {"id": 2}, True) is None
    # multi-field partial credit
    labels2 = {1: {"a": "x", "b": "y"}}
    v2 = LabeledValidator(labels2, "id")
    assert v2.map_score_fn(["a", "b"], {"id": 1}, {"a": "x", "b": "z"}) == 0.5


# ---- sample-driven choice -------------------------------------------------


def _doc_rows(n=12):
    return [
        {"id": i, "text": f"doc {i}", "lang": ["en", "fr", "de"][i % 3]}
        for i in range(n)
    ]


def _docnum(p):
    return int(re.search(r"doc (\d+)", p).group(1))


def _map_stage():
    # NOTE: these closures ship to Ray actors in optimize_and_run —
    # they must be self-contained (cloudpickle serializes nested fns by
    # value, but a reference to a module-level helper in tests/ would
    # be pickled by name and fail to import on workers)
    def good(p):
        import re as _re

        i = int(_re.search(r"doc (\d+)", p).group(1))
        import json as _json

        return _json.dumps({"lang_out": ["en", "fr", "de"][i % 3]})

    def cheap(p):
        import json as _json

        return _json.dumps({"lang_out": "en"})  # right 1/3 of the time

    return SemStage(
        "map", "what language: {text}", fields=["lang_out"],
        candidates=[
            SemCandidate("expensive-right", mock_generator(good),
                         cost_per_call=10.0, time_per_call=0.2),
            SemCandidate("cheap-wrong", mock_generator(cheap),
                         cost_per_call=1.0, time_per_call=0.1),
        ],
    )


def _labels(rows):
    return {
        r["id"]: {"lang_out": r["lang"],
                  "keep-english: {text}": r["lang"] == "en"}
        for r in rows
    }


def test_optimize_policies_pick_different_candidates():
    rows = _doc_rows()
    val = LabeledValidator(_labels(rows), "id")
    stage = _map_stage()
    r = optimize(rows, [stage], val, MaxQuality())
    assert r.chosen == ["expensive-right"]
    assert r.plan_cost.quality == 1.0 and r.plan_cost.cost == 10.0
    r = optimize(rows, [stage], val, MinCost())
    assert r.chosen == ["cheap-wrong"]
    assert r.plan_cost.quality == pytest.approx(1 / 3)
    # constrained: cheapest plan above the quality floor
    r = optimize(rows, [stage], val,
                 construct_policy_from_kwargs(min_cost=True,
                                              quality_threshold=0.5))
    assert r.chosen == ["expensive-right"]
    # constrained: best quality under the cost ceiling excludes the
    # expensive candidate (10.0/record > 5.0 budget)
    r = optimize(rows, [stage], val, MaxQualityAtFixedCost(5.0))
    assert r.chosen == ["cheap-wrong"]
    # unsatisfiable constraint: reference protocol keeps ALL plans
    # (optimizer_strategy.py:130) and the objective decides
    r = optimize(rows, [stage], val, MaxQualityAtFixedCost(0.0001))
    assert r.chosen == ["expensive-right"]
    # MinTime picks the faster declared candidate on quality tie? no —
    # different qualities, time objective wins outright
    r = optimize(rows, [stage], val, MinTime())
    assert r.chosen == ["cheap-wrong"]


def test_optimize_two_stage_selectivity_and_feeding():
    rows = _doc_rows()
    val = LabeledValidator(_labels(rows), "id")

    def f_exact(p):
        return "true" if _docnum(p) % 3 == 0 else "false"

    def f_all(p):
        return "true"

    fstage = SemStage(
        "filter", "keep-english: {text}",
        candidates=[
            SemCandidate("exact-filter", mock_generator(f_exact),
                         cost_per_call=5.0),
            SemCandidate("pass-all", mock_generator(f_all),
                         cost_per_call=0.5),
        ],
    )
    mstage = _map_stage()
    r = optimize(rows, [fstage, mstage], val, MaxQuality())
    # downstream sampled on the max-quality filter's survivors (all
    # 'en'), where the constant-'en' map also scores 1.0 and wins the
    # cost tiebreak — the reference's max-quality-upstream convention
    assert r.chosen == ["exact-filter", "cheap-wrong"]
    assert r.plan_cost.quality == 1.0
    # cost: 5.0 (filter) + selectivity 1/3 x 1.0 (map)
    assert r.plan_cost.cost == pytest.approx(5.0 + (1 / 3) * 1.0)
    r = optimize(rows, [fstage, mstage], val, MinCost())
    assert r.chosen == ["pass-all", "cheap-wrong"]
    assert r.plan_cost.cost == pytest.approx(0.5 + 1.0)
    # filter stats carry measured selectivity
    fstats = {s.name: s for s in r.stats[0]}
    assert fstats["exact-filter"].selectivity == pytest.approx(1 / 3)
    assert fstats["pass-all"].selectivity == 1.0
    assert fstats["exact-filter"].quality == 1.0
    # pass-all keeps the 2/3 non-english wrongly
    assert fstats["pass-all"].quality == pytest.approx(1 / 3)


def test_optimize_unscored_candidate_defaults_to_one():
    # validator abstains everywhere -> quality defaults to 1.0
    # (reference cost_model.py:146)
    rows = _doc_rows(6)
    val = LabeledValidator({}, "id")
    stage = _map_stage()
    r = optimize(rows, [stage], val, MaxQuality())
    # both 1.0 -> cost tiebreak picks the cheap one
    assert r.chosen == ["cheap-wrong"]
    assert all(s.quality == 1.0 and s.n_scored == 0 for s in r.stats[0])


def test_optimize_and_run_distributed(ray_session):
    import ray.data as rd

    rows = _doc_rows(60)
    val = LabeledValidator(_labels(rows[:12]), "id")

    def f_exact(p):
        import re as _re

        return "true" if int(_re.search(r"doc (\d+)", p).group(1)) % 3 == 0 \
            else "false"

    fstage = SemStage(
        "filter", "keep-english: {text}",
        candidates=[
            SemCandidate("exact-filter", mock_generator(f_exact),
                         cost_per_call=5.0),
        ],
    )
    mstage = _map_stage()
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out, res = optimize_and_run(
        ds, [fstage, mstage], val, MaxQuality(),
        sample_size=12, concurrency=1, batch_size=16,
    )
    assert res.chosen == ["exact-filter", "cheap-wrong"]
    tab = pa.Table.from_pylist(out.take_all())
    # the chosen plan ran over ALL 60 rows: ids % 3 == 0 survive,
    # each mapped to lang_out='en' by the chosen map candidate
    assert sorted(tab["id"].to_pylist()) == [i for i in range(60) if i % 3 == 0]
    assert set(tab["lang_out"].to_pylist()) == {"en"}


def test_pareto_frontier():
    from palimpzest_ray.optimizer import pareto_frontier

    plans = [
        PlanCost(cost=1.0, time=1.0, quality=0.5),   # frontier
        PlanCost(cost=2.0, time=2.0, quality=0.4),   # dominated by 0
        PlanCost(cost=3.0, time=1.0, quality=0.9),   # frontier
        PlanCost(cost=1.0, time=1.0, quality=0.5),   # tie with 0: kept
        PlanCost(cost=0.5, time=5.0, quality=0.2),   # frontier (cheap)
    ]
    assert pareto_frontier(plans) == [0, 2, 3, 4]


def test_optimize_flat_map_stage():
    """flat_map candidates: fan-out selectivity is measured (>1) and
    scales downstream cost; LabeledValidator scores list outputs with
    the length-penalized field match."""
    rows = [{"id": i, "text": f"doc {i}"} for i in range(8)]
    labels = {
        r["id"]: {"piece": [f"p{r['id']}-0", f"p{r['id']}-1"]}
        for r in rows
    }
    val = LabeledValidator(labels, "id")

    def exact(p):
        import json as _json
        import re as _re

        i = int(_re.search(r"doc (\d+)", p).group(1))
        return _json.dumps([{"piece": f"p{i}-0"}, {"piece": f"p{i}-1"}])

    def over(p):
        import json as _json
        import re as _re

        i = int(_re.search(r"doc (\d+)", p).group(1))
        # right pieces plus a spurious third -> length-penalized 2/3
        return _json.dumps([
            {"piece": f"p{i}-0"}, {"piece": f"p{i}-1"},
            {"piece": "junk"},
        ])

    fstage = SemStage(
        "flat_map", "split: {text}", fields=["piece"],
        candidates=[
            SemCandidate("exact-2", mock_generator(exact),
                         cost_per_call=4.0),
            SemCandidate("over-3", mock_generator(over),
                         cost_per_call=1.0),
        ],
    )
    mstage = _map_stage()
    r = optimize(rows, [fstage], val, MaxQuality())
    assert r.chosen == ["exact-2"] and r.plan_cost.quality == 1.0
    st = {s.name: s for s in r.stats[0]}
    assert st["exact-2"].selectivity == 2.0     # measured fan-out
    assert st["over-3"].selectivity == 3.0
    assert st["over-3"].quality == pytest.approx(2 / 3)
    # downstream cost scales by the chosen fan-out in plan enumeration
    r2 = optimize(rows, [fstage, mstage], val, MaxQuality())
    assert r2.plan_cost.cost == pytest.approx(4.0 + 2.0 * 1.0)


def test_optimize_and_run_flat_map_distributed(ray_session):
    import pyarrow as pa
    import ray.data as rd

    rows = [{"id": i, "text": f"doc {i}"} for i in range(20)]
    labels = {
        r["id"]: {"piece": [f"p{r['id']}-0", f"p{r['id']}-1"]}
        for r in rows[:8]
    }
    val = LabeledValidator(labels, "id")

    def exact(p):
        import json as _json
        import re as _re

        i = int(_re.search(r"doc (\d+)", p).group(1))
        return _json.dumps([{"piece": f"p{i}-0"}, {"piece": f"p{i}-1"}])

    stage = SemStage(
        "flat_map", "split: {text}", fields=["piece"],
        candidates=[SemCandidate("exact-2", mock_generator(exact),
                                 cost_per_call=1.0)],
    )
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out, res = optimize_and_run(
        ds, [stage], val, MaxQuality(), sample_size=8,
        concurrency=1, batch_size=8,
    )
    tab = pa.Table.from_pylist(out.take_all())
    assert tab.num_rows == 40
    assert sorted(set(tab["id"].to_pylist())) == list(range(20))


def test_optimize_and_run_train_dataset_and_policy_sugar(ray_session):
    """Reference conventions (dataset.py:682-723 + run() kwargs
    sugar): train_dataset supplies the sample rows; policy keyword
    arguments replace an explicit Policy; omitting both train_dataset
    and validator asserts; validator=None routes to the o/s LLM-judge
    refusal."""
    import pyarrow as pa
    import ray.data as rd

    rows = _doc_rows(30)
    train = rows[:9]
    val = LabeledValidator(_labels(train), "id")
    stage = _map_stage()
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out, res = optimize_and_run(
        ds, [stage], val, train_dataset=train,
        min_cost=True, quality_threshold=0.5,
        concurrency=1, batch_size=16,
    )
    assert res.chosen == ["expensive-right"]
    assert res.stats[0][0].n_inputs == 9  # sampled the train set
    tab = pa.Table.from_pylist(out.take_all())
    assert tab.num_rows == 30
    with pytest.raises(AssertionError, match="at least one"):
        optimize_and_run(ds, [stage], None)
    with pytest.raises(NotImplementedError, match="out of scope"):
        optimize_and_run(ds, [stage], None, train_dataset=train)


def test_optimize_join_stage_and_distributed_run(ray_session):
    """join stage kind (reference JoinOp sampling): candidates judged
    per (left, right) pair with join_score_fn over pair labels;
    MaxQuality picks the exact condition; the winner runs distributed
    through sem_join with the same merge discipline."""
    import pyarrow as pa
    import ray.data as rd

    left = [{"id": i, "color": ["red", "blue"][i % 2]} for i in range(10)]
    right_table = pa.Table.from_pylist([
        {"id": 100, "hue": "red"}, {"id": 101, "hue": "blue"},
    ])
    cond = "match: {row} {right}"
    join_labels = {
        (l["id"], r["id"]): {cond: l["color"] == r["hue"]}
        for l in left for r in right_table.to_pylist()
    }
    val = LabeledValidator({}, "id", join_labels=join_labels)

    def exact(p):
        import json as _json

        l = _json.loads(p.split("match: ")[1].rsplit(" {", 1)[0])
        r = _json.loads("{" + p.rsplit(" {", 1)[1])
        return "yes" if l["color"] == r["hue"] else "no"

    def always(p):
        return "yes"

    stage = SemStage(
        "join", cond,
        candidates=[
            SemCandidate("exact-join", mock_generator(exact),
                         cost_per_call=2.0),
            SemCandidate("cross-join", mock_generator(always),
                         cost_per_call=0.5),
        ],
        right_table=right_table,
    )
    r = optimize(left, [stage], val, MaxQuality())
    assert r.chosen == ["exact-join"]
    st = {s.name: s for s in r.stats[0]}
    assert st["exact-join"].quality == 1.0
    assert st["exact-join"].selectivity == 1.0   # one match per left
    assert st["cross-join"].selectivity == 2.0   # cross product
    assert st["cross-join"].quality == pytest.approx(0.5)
    # per-input-record cost includes the right-side multiplier
    assert st["exact-join"].cost_per_record == pytest.approx(2.0 * 2)
    r2 = optimize(left, [stage], val, MinCost())
    assert r2.chosen == ["cross-join"]

    ds = rd.from_arrow(pa.Table.from_pylist(left))
    out, res = optimize_and_run(
        ds, [stage], val, MaxQuality(), sample_size=10,
        concurrency=1, batch_size=8,
    )
    tab = pa.Table.from_pylist(out.take_all())
    assert tab.num_rows == 10
    assert all(
        c == h for c, h in zip(tab["color"].to_pylist(),
                               tab["hue"].to_pylist())
    )


def test_optimize_topk_stage_f1_scoring():
    """topk stage kind: candidates are retrieval configs (callable
    generators over an index); scoring = mean per-field F1 against the
    labeled relevant sets (reference validator.py:229 intent)."""
    docs = {i: [f"d{i}", f"d{i+1}", f"d{i+2}"] for i in range(6)}
    rows = [{"id": i, "q": f"query {i}"} for i in range(6)]
    labels = {i: {"hits": docs[i]} for i in range(6)}
    val = LabeledValidator(labels, "id")

    def perfect(p):
        import json as _json
        import re as _re

        i = int(_re.search(r"query (\d+)", p).group(1))
        return _json.dumps({"hits": [f"d{i}", f"d{i+1}", f"d{i+2}"]})

    def lossy(p):
        import json as _json
        import re as _re

        i = int(_re.search(r"query (\d+)", p).group(1))
        # 2 of 3 right, 1 junk -> precision 2/3, recall 2/3, F1 2/3
        return _json.dumps({"hits": [f"d{i}", f"d{i+1}", "junk"]})

    stage = SemStage(
        "topk", "retrieve: {q}", fields=["hits"],
        candidates=[
            SemCandidate("ivf-wide", mock_generator(perfect),
                         cost_per_call=5.0),
            SemCandidate("ivf-narrow", mock_generator(lossy),
                         cost_per_call=1.0),
        ],
    )
    r = optimize(rows, [stage], val, MaxQuality())
    assert r.chosen == ["ivf-wide"] and r.plan_cost.quality == 1.0
    st = {s.name: s for s in r.stats[0]}
    assert st["ivf-narrow"].quality == pytest.approx(2 / 3)
    r2 = optimize(rows, [stage], val,
                  MinCostAtFixedQuality(0.7))
    assert r2.chosen == ["ivf-wide"]
    r3 = optimize(rows, [stage], val, MinCostAtFixedQuality(0.5))
    assert r3.chosen == ["ivf-narrow"]


# ---- selection-protocol properties (pure python, hypothesis) --------------


from hypothesis import given, settings
from hypothesis import strategies as st

_plan = st.builds(
    PlanCost,
    cost=st.floats(0, 100, allow_nan=False),
    time=st.floats(0, 100, allow_nan=False),
    quality=st.floats(0, 1, allow_nan=False),
)


def _select(plans, policy):
    """The reference selection protocol, verbatim
    (optimizer_strategy.py:129-139)."""
    if any(policy.constraint(p) for p in plans):
        plans = [p for p in plans if policy.constraint(p)]
    best = plans[0]
    for p in plans[1:]:
        best = best if policy.choose(best, p) else p
    return best


@given(st.lists(_plan, min_size=1, max_size=12))
@settings(max_examples=200, deadline=None)
def test_winner_is_never_dominated(plans):
    """For every policy, the linear-choose winner lies on the pareto
    frontier — which is why optimize()'s pareto pre-filter can never
    change the selected plan."""
    from palimpzest_ray.optimizer import pareto_frontier

    frontier = set(pareto_frontier(plans))
    for policy in (MaxQuality(), MinCost(), MinTime(),
                   MaxQualityAtFixedCost(50.0),
                   MinCostAtFixedQuality(0.5)):
        best = _select(plans, policy)
        # the winner equals SOME frontier plan on all three metrics
        assert any(
            plans[i].cost == best.cost and plans[i].time == best.time
            and plans[i].quality == best.quality
            for i in frontier
        )
        # and selecting from the frontier alone gives the same verdict
        fbest = _select([plans[i] for i in sorted(frontier)], policy)
        assert (fbest.cost, fbest.time, fbest.quality) == (
            best.cost, best.time, best.quality,
        )


@given(st.lists(_plan, min_size=1, max_size=12),
       st.floats(0.01, 99, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_constraint_filter_only_when_satisfiable(plans, budget):
    """MaxQuality@FixedCost: when ANY plan fits the budget the winner
    fits it; when none do, selection degrades to pure MaxQuality
    (reference optimizer_strategy.py:130)."""
    policy = MaxQualityAtFixedCost(budget)
    best = _select(plans, policy)
    if any(p.cost < budget for p in plans):
        assert best.cost < budget
    else:
        unconstrained = _select(plans, MaxQuality())
        assert best.quality == unconstrained.quality


def test_optimize_reorder_pushes_filter_below_expensive_convert():
    """reorder=True mirrors the reference PushDownFilter scenario
    (tests/pytest/test_optimizer.py test_push_down_filter): an
    independent filter moves BELOW an expensive convert under MinCost
    (measured selectivity scales the convert's per-record cost), while
    a filter that depends_on the generated field stays after it."""
    rows = _doc_rows(12)
    labels = _labels(rows)
    val = LabeledValidator(labels, "id")
    mstage = _map_stage()  # generates lang_out

    def f_exact(p):
        return "true" if _docnum(p) % 3 == 0 else "false"

    indep = SemStage(
        "filter", "keep-english: {text}",
        candidates=[SemCandidate("keep-en", mock_generator(f_exact),
                                 cost_per_call=0.5)],
    )
    # convert (10.0/rec) first, then filter: identity order costs
    # 10 + 0.5; pushed-down order costs 0.5 + (1/3) x 10
    r_fixed = optimize(rows, [mstage, indep], val, MinCost())
    assert r_fixed.order == [0, 1]
    r = optimize(rows, [mstage, indep], val, MinCost(), reorder=True)
    assert r.order == [1, 0]  # filter pushed below the convert
    assert r.chosen[0] == "keep-en"
    assert r.plan_cost.cost == pytest.approx(0.5 + (1 / 3) * 1.0)
    # (MinCost also swaps to the cheap map candidate downstream)

    # dependent filter: template references the GENERATED field ->
    # only the identity order is admissible
    dep = SemStage(
        "filter", "is {lang_out} romance?",
        candidates=[SemCandidate("dep-filter",
                                 mock_generator(lambda p: "true"),
                                 cost_per_call=0.5)],
    )
    r2 = optimize(rows, [mstage, dep], val, MinCost(), reorder=True)
    assert r2.order == [0, 1]

    # explicit depends_on=[] overrides template inference ({row}-style
    # whole-record templates would otherwise pin the order)
    indep2 = SemStage(
        "filter", "keep-english: {text}",
        candidates=[SemCandidate("keep-en2", mock_generator(f_exact),
                                 cost_per_call=0.5)],
        depends_on=[],
    )
    r3 = optimize(rows, [mstage, indep2], val, MinCost(), reorder=True)
    assert r3.order == [1, 0]


def test_optimize_and_run_reorder_distributed(ray_session):
    import pyarrow as pa
    import ray.data as rd

    rows = _doc_rows(30)
    val = LabeledValidator(_labels(rows[:12]), "id")
    mstage = _map_stage()

    def f_exact(p):
        import re as _re

        return "true" if int(_re.search(r"doc (\d+)", p).group(1)) % 3 == 0 \
            else "false"

    indep = SemStage(
        "filter", "keep-english: {text}",
        candidates=[SemCandidate("keep-en", mock_generator(f_exact),
                                 cost_per_call=0.5)],
    )
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out, res = optimize_and_run(
        ds, [mstage, indep], val, MinCost(), sample_size=12,
        reorder=True, concurrency=1, batch_size=16,
    )
    assert res.order == [1, 0]
    tab = pa.Table.from_pylist(out.take_all())
    assert sorted(tab["id"].to_pylist()) == [i for i in range(30) if i % 3 == 0]
    assert "lang_out" in tab.column_names
