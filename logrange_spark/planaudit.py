"""Mechanical broadcast audit of physical plans.

The rule (SCALE.md "sf1 sweep", learned from the repeated_spans x100
OOM): a frame whose row count grows with the corpus must never reach a
``BroadcastExchange`` ON THE STRENGTH OF A DERIVED SIZE ESTIMATE.
Catalyst sizes a raw parquet scan (plus filters/projections) from the
actual file statistics, so a plain scan that broadcasts at test scale
simply stops broadcasting at 100 TB — self-correcting, not a bug. The
killer is a frame DERIVED from a corpus-scaled scan through an
operator whose output-size estimate undershoots — a keyed aggregate, a
join, an explode, a mapInPandas — where the estimator keeps reporting
"small" while the actual payload grows with the data: AQE broadcasts
it at any scale and dies with "Could not allocate memory to grow
BytesToBytesMap".

``broadcast_violations`` walks the executed-plan tree and returns every
BroadcastExchange subtree where a corpus-scaled scan feeds the exchange
THROUGH a deriving operator, with no bounding operator (zero-key
one-row aggregate / limit / top-k) in between. tests/
test_broadcast_audit.py runs it over EVERY registry query at x10 so the
rule is enforced suite-wide, not per-operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# operators that bound the row count of everything above them
_CAP_NODES = (
    "GlobalLimit",
    "LocalLimit",
    "TakeOrderedAndProject",
    "CollectLimit",
)
_AGG_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")

# operators whose OUTPUT-size estimate is derived (and in practice
# undershoots) rather than read from file statistics: a broadcast
# decided above one of these does not self-correct with data volume.
# Window is excluded (row-preserving); Union/Exchange/Sort/Project/
# Filter keep the scan-based estimate honest enough for the broadcast
# decision to flip as the data grows.
_DERIVING_NODES = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Generate",          # explode: output rows >> input rows
    "Expand",            # rollup/cube row multiplication
    "MapInPandas",       # arbitrary fan-out in Python
    "FlatMapGroupsInPandas",
    "MapPartitions",
)


def _children(node) -> list:
    out = []
    seq = node.children()
    for i in range(seq.size()):
        out.append(seq.apply(i))
    return out


def _node_line(node) -> str:
    # simpleString(maxFields) — the one-line form ("HashAggregate(keys=[],
    # ...)"); verbose enough to read grouping keys and scan locations
    try:
        return node.simpleString(2000)
    except Exception:
        return node.toString().splitlines()[0]


def _leaf_detail(node) -> str:
    # leaf scans carry Location/ReadSchema only in the verbose form
    try:
        return node.verboseStringWithSuffix(4000)
    except Exception:
        return node.toString()


def _walk_for_scans(
    node, capped: bool, derived: bool, scaled_markers, hits: list
) -> None:
    line = _node_line(node)
    name = node.nodeName()
    # HashAggregate prints "keys=[]", SortAggregate prints "key=[]"
    if any(name.startswith(a) for a in _AGG_NODES) and (
        "keys=[]" in line or "key=[]" in line
    ):
        capped = True  # one-row aggregate: everything above is bounded
    elif any(name.startswith(d) for d in _DERIVING_NODES):
        derived = True  # estimate above here no longer tracks file size
    if any(name.startswith(c) for c in _CAP_NODES):
        capped = True
    kids = _children(node)
    if not kids:
        if derived and not capped:
            detail = _leaf_detail(node)
            for marker in scaled_markers:
                if marker in detail:
                    hits.append({"scan": marker, "leaf": line[:200]})
            # An RDD-scan leaf (localCheckpoint'd frame, createDataFrame)
            # has NO path marker and NO file statistics, so a frame
            # derived from it cannot self-correct its size estimate —
            # treat it as scaled-by-default (a checkpointed corpus frame
            # is exactly the case that escaped the r13 audit). Bounded
            # literal frames that legitimately broadcast through a
            # deriving operator get an ALLOWED entry in the suite test.
            if "ExistingRDD" in name or "ExistingRDD" in line:
                hits.append(
                    {"scan": "ExistingRDD (checkpoint/local frame)",
                     "leaf": line[:200]}
                )
        return
    for ch in kids:
        _walk_for_scans(ch, capped, derived, scaled_markers, hits)


def _walk(node, scaled_markers, violations: list) -> None:
    name = node.nodeName()
    if name.startswith("AdaptiveSparkPlan"):
        # audit the pre-runtime plan: AQE can only SHRINK exchanges it
        # finds there (and hints pin join strategy through re-planning)
        _walk(node.initialPlan(), scaled_markers, violations)
        return
    if name.startswith("BroadcastExchange"):
        hits: list = []
        for ch in _children(node):
            _walk_for_scans(ch, False, False, scaled_markers, hits)
        if hits:
            violations.append(
                {"exchange": _node_line(node)[:200], "scans": hits}
            )
        # keep walking below: a nested exchange inside a broadcast
        # subtree would be reported once here, which is enough
        return
    for ch in _children(node):
        _walk(ch, scaled_markers, violations)
    # subqueries (scalar/inner) hang off innerChildren, not children
    try:
        inner = node.innerChildren()
        for i in range(inner.size()):
            _walk(inner.apply(i), scaled_markers, violations)
    except Exception:
        pass


def broadcast_violations(
    df: DataFrame, scaled_markers: list[str]
) -> list[dict]:
    """Every BroadcastExchange subtree in ``df``'s physical plan whose
    payload is DERIVED (through an aggregate/join/explode/mapInPandas)
    from a source matching one of ``scaled_markers`` (substring match on
    the leaf scan's verbose description, e.g. ``"x10/documents.parquet"``)
    with no bounding operator in between. Raw scan(+filter/project)
    broadcasts are not violations — their size estimate is the actual
    file size, so the broadcast decision self-corrects with data volume.
    Empty list = the plan obeys the never-broadcast-data-scaled rule."""
    violations: list = []
    _walk(df._jdf.queryExecution().executedPlan(), scaled_markers, violations)
    return violations
