"""Plan inspection (SURVEY.md §4.2 — verify Catalyst did its part).

Used by tests and bench to assert the physical properties that matter
at 100 TB: filters reached the parquet scan, small dims broadcast,
expressions stayed inside whole-stage codegen.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters fragments of the formatted plan."""
    return "\n".join(
        line.strip() for line in plan_string(df).splitlines() if "PushedFilters" in line
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df, "simple")


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan_string(df, "simple")


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans in the FINAL plan. Under AQE
    the final physical plan only exists after execution, so this runs
    the query through the noop sink first (cheap at test scale)."""
    import re

    df.collect()  # a write would execute a different QueryExecution
    plan = plan_string(df, "simple")
    # codegen spans render as "*(N)" stage markers in simple mode
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def scan_file_counts(df: DataFrame) -> list[int]:
    """The ``numFiles`` metric of every file scan in the EXECUTED plan
    (runs the query): the ground truth for partition-pruning tests —
    unlike ``df.inputFiles()``, which lists the relation's files
    without applying pushed filters."""
    df.collect()

    out: list[int] = []

    def walk(n) -> None:
        if "Scan" in n.nodeName():
            m = n.metrics()
            if m.contains("numFiles"):
                out.append(m.apply("numFiles").value())
        for i in range(n.children().size()):
            walk(n.children().apply(i))
        try:  # AdaptiveSparkPlanExec hides the real tree post-execution
            walk(n.finalPhysicalPlan())
        except Exception:
            pass

    walk(df._jdf.queryExecution().executedPlan())
    return out


def scan_read_schema(df: DataFrame) -> str:
    """ReadSchema fragments — check column pruning reached the scan."""
    return "\n".join(
        line.strip() for line in plan_string(df).splitlines() if "ReadSchema" in line
    )


#: Leaf-scan attribute names that identify a CORPUS-sized table (the
#: fact tables that grow with the data; dimensions like region/nation/
#: customer/supplier/part stay broadcast-sized).
_FACT_SIGNATURE_COLS = (
    "l_orderkey",
    "o_orderkey",
    "event_id",
    "doc_id",
    "vec_id",
    "media_id",
)

#: Grouping on a per-row id keeps corpus cardinality — an Aggregate
#: only BLOCKS the corpus-size taint when none of these appear in its
#: grouping expressions (e.g. groupBy(n_tok) reduces to the distinct
#: value table; groupBy(doc_id) does not reduce at all).
_ROW_ID_COLS = _FACT_SIGNATURE_COLS + ("chunk_id", "user_id", "i", "j")


def _attr_names(rendered: str) -> set[str]:
    """Exact attribute names from a plan-rendered expression string:
    ``sum(nt#12) AS roi#34`` -> {'nt', 'roi'}. Substring tests against
    the raw string would false-match ('roi#' contains 'i#')."""
    import re

    return set(re.findall(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", rendered))


#: Dimension-typed (bounded-cardinality) column names: a Window whose
#: partition keys are ONLY these funnels each group's full corpus share
#: through one task — at 100 TB with 20 sources that is a multi-TB
#: single-task sort. Value-typed keys (n_tok, ce, md5 buckets, doc_id
#: ranges) are fine: their cardinality grows with the data.
_DIMENSION_COLS = (
    "source",
    "lang",
    "capped",
    "band",
    "third",
    "bucket",
    "role",
    "split",
    "event_type",
    "o_orderstatus",
    "o_orderpriority",
    "l_returnflag",
    "l_linestatus",
    "l_shipmode",
    "r_name",
    "n_name",
    "p_brand",
    "p_container",
)


def _bare_attr(rendered: str) -> str | None:
    """The attribute name iff ``rendered`` is a BARE reference like
    ``doc_id#12`` / ``doc_id#12L`` (possibly type-annotated)."""
    import re

    m = re.fullmatch(r"([A-Za-z_][A-Za-z0-9_]*)#\d+L?(?::\s*\w+)?", rendered.strip())
    return m.group(1) if m else None


#: Rendered-expression fragments that actually SHRINK a per-row id's
#: cardinality (ADVICE r6: a derived grouping is NOT automatically
#: reducing — ``xxhash64(doc_id)`` or ``doc_id + 0`` keeps corpus
#: cardinality; only bucketing shapes reduce): integer division /
#: right-shift / modulo by a constant, and fixed-length substring
#: prefixes (md5-hex bucketing). ADVICE r7: fractional ``/`` is NOT
#: reducing (``doc_id / 2`` is a bijection on bigints-as-doubles up to
#: precision), and a fragment only reduces the refs INSIDE its own
#: argument span — ``concat(doc_id, substring(source,1,2))`` leaves
#: ``doc_id`` unreduced (span logic in ``_reducing_spans``).
_REDUCING_FUNCS = ("shiftright(", "pmod(", "substring(", "substr(")
_REDUCING_INFIX = (" div ", " % ")


def _match_paren(s: str, open_idx: int) -> int:
    """Index of the ``)`` matching ``s[open_idx] == '('``, or len(s)."""
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return len(s)


def _strip_window_specs(s: str) -> str:
    """Remove every ``windowspecdefinition(...)`` span (balanced) from a
    rendered expression. The spec's partition/order keys shape window
    FRAMES, not the value's cardinality — ``lead(w) OVER (PARTITION BY
    doc_id ...)`` groups by a w-derived value, and seeing ``doc_id``
    inside the spec must not taint it (the k83/k87 shingle false
    positive). The window FUNCTION's own argument list stays, so
    ``min(doc_id) OVER (PARTITION BY doc_id)`` — whose VALUE is the row
    id — is still judged cardinality-preserving."""
    marker = "windowspecdefinition("
    while True:
        i = s.find(marker)
        if i < 0:
            return s
        close = _match_paren(s, i + len(marker) - 1)
        s = s[:i] + s[close + 1 :]


def _reducing_spans(s: str) -> list[tuple[int, int]]:
    """Character spans of ``s`` covered by a cardinality-reducing
    fragment's ARGUMENT LIST: the balanced parens of a reducing
    function, or the innermost paren group enclosing a reducing infix
    operator (Catalyst renders binary ops parenthesized:
    ``(doc_id#0L div 4096)``)."""
    spans: list[tuple[int, int]] = []
    for f in _REDUCING_FUNCS:
        start = 0
        while (i := s.find(f, start)) >= 0:
            open_idx = i + len(f) - 1
            spans.append((open_idx, _match_paren(s, open_idx)))
            start = i + 1
    if any(op in s for op in _REDUCING_INFIX):
        # matching-paren map once, then innermost enclosure per operator
        stack: list[int] = []
        pairs: dict[int, int] = {}
        for i, ch in enumerate(s):
            if ch == "(":
                stack.append(i)
            elif ch == ")" and stack:
                pairs[stack.pop()] = i
        for op in _REDUCING_INFIX:
            start = 0
            while (i := s.find(op, start)) >= 0:
                enclosing = [
                    (a, b) for a, b in pairs.items() if a < i < b
                ]
                if enclosing:
                    spans.append(max(enclosing, key=lambda ab: ab[0]))
                start = i + 1
    return spans


def _alias_defs(node) -> dict[str, str]:
    """``name#id`` → rendered defining expression, collected from every
    Alias in the subtree. The optimizer hoists derived grouping keys
    into a Project below the Aggregate (``groupBy(xxhash64(doc_id))``
    becomes Aggregate [h] over Project [xxhash64(doc_id) AS h]), so
    judging a grouping attr needs its definition resolved."""
    import re

    defs: dict[str, str] = {}

    def walk(n) -> None:
        try:
            exprs = n.expressions()
            for i in range(exprs.size()):
                e = exprs.apply(i)
                if e.getClass().getSimpleName() != "Alias":
                    continue
                m = re.fullmatch(
                    r"(.*) AS ([A-Za-z_][A-Za-z0-9_]*#\d+)L?", e.toString()
                )
                if m:
                    defs[m.group(2)] = m.group(1)
        except Exception:
            pass  # node kind without expressions()
        kids = n.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(node)
    return defs


def _expand_refs(rendered: str, defs: dict[str, str], depth: int = 10) -> str:
    """Textually inline alias definitions into ``rendered`` until only
    row-id refs, underived attrs, and literals remain (bounded depth)."""
    import re

    pat = re.compile(r"([A-Za-z_][A-Za-z0-9_]*#\d+)L?")
    for _ in range(depth):
        changed = False

        def sub(m) -> str:
            nonlocal changed
            ref = m.group(1)
            if ref.split("#")[0] in _ROW_ID_COLS:
                return m.group(0)  # terminal: the thing we track
            if ref in defs:
                changed = True
                return "(" + defs[ref] + ")"
            return m.group(0)

        rendered = pat.sub(sub, rendered)
        if not changed:
            break
    return rendered


def _grouping_keeps_row_cardinality(rendered: str, defs: dict[str, str]) -> bool:
    """True when one grouping expression preserves per-row-id
    cardinality: a bare row-id attribute, or ANY derived expression
    over a row id that lacks a known bucketing shape (the hash/affine
    trap ADVICE r6 names — ``xxhash64(doc_id)`` is a bijection-ish
    rename, not a reduction). Aliased derivations are resolved through
    the subtree's Projects first; window partition/order specs are
    stripped before judging (the spec's keys don't enter the value);
    and a reducing fragment only absolves row-id refs INSIDE its own
    argument span (ADVICE r7) — every ref must be covered by some
    reducing span, else the expression keeps corpus cardinality."""
    import re

    expanded = _strip_window_specs(_expand_refs(rendered, defs))
    bare = _bare_attr(expanded)
    if bare is not None:
        return bare in _ROW_ID_COLS
    row_refs = [
        m.span()
        for m in re.finditer(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", expanded)
        if m.group(1) in _ROW_ID_COLS
    ]
    if not row_refs:
        return False  # derived over value/dimension columns only
    spans = _reducing_spans(expanded)
    return any(
        not any(s <= a and b <= e + 1 for s, e in spans) for a, b in row_refs
    )


def _corpus_sized(node) -> bool:
    """True when a fact-table leaf scan is reachable from ``node``
    without passing a cardinality-reducing operator: a Limit, or an
    Aggregate none of whose grouping expressions keeps per-row-id
    cardinality (bucketing expressions like ``doc_id div 4096`` or
    ``pmod(xxhash64(doc_id), 64)`` reduce by the bucket width;
    ``doc_id`` itself — or a cardinality-preserving derivation like
    ``xxhash64(doc_id)`` — does not)."""
    cls = node.getClass().getSimpleName()
    if cls in ("GlobalLimit", "LocalLimit"):
        return False
    if cls == "WindowGroupLimit":
        # a rank-filter top-K (InferWindowGroupLimit's logical node)
        # bounds output to K x |partition groups|: reducing unless the
        # partition keys themselves keep per-row-id cardinality (a
        # top-K per doc_id is still corpus-sized)
        ps = node.partitionSpec()
        defs = _alias_defs(node)
        if not any(
            _grouping_keeps_row_cardinality(ps.apply(i).toString(), defs)
            for i in range(ps.size())
        ):
            return False
    if cls == "Aggregate":
        ges = node.groupingExpressions()
        defs = _alias_defs(node)
        if not any(
            _grouping_keeps_row_cardinality(ges.apply(i).toString(), defs)
            for i in range(ges.size())
        ):
            return False  # reduced to value/dimension cardinality
    kids = node.children()
    if kids.size() == 0:
        out = _attr_names(node.output().mkString(","))
        return bool(out & set(_FACT_SIGNATURE_COLS))
    return any(_corpus_sized(kids.apply(i)) for i in range(kids.size()))


def unpartitioned_corpus_windows(df: DataFrame) -> list[str]:
    """Window nodes with an EMPTY partitionSpec whose input can still be
    corpus-sized — the single-partition scale-killer (every row of a
    100 TB table funnels through one task).

    Walks the optimized logical plan: a Window with no partition
    expressions is flagged when some leaf scan of a fact table is
    reachable from it without passing through a cardinality-reducing
    node (see ``_corpus_sized``). Returns human-readable descriptions
    of the offending nodes; empty list == scale-clean.
    """
    jplan = df._jdf.queryExecution().optimizedPlan()
    offenders: list[str] = []

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "Window" and node.partitionSpec().isEmpty():
            kids = node.children()
            if any(_corpus_sized(kids.apply(i)) for i in range(kids.size())):
                offenders.append(node.simpleString(120))
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(jplan)
    return offenders


def low_cardinality_corpus_windows(df: DataFrame) -> list[str]:
    """Window nodes whose partition keys are ALL dimension-typed
    (``_DIMENSION_COLS`` — source, lang, flags, …) over a corpus-sized
    input: the low-cardinality-key twin of the empty-partitionSpec
    tripwire (VERDICT r5 ask #2). With 20 sources, ``partitionBy
    ("source")`` over 100 TB funnels ~5 TB through ONE task's
    sort+scan — same failure mode as a global window, just sliced.

    Allowlisted: windows Spark compiled to ``WindowGroupLimit``
    (rank-filter shapes, e.g. per-source top-k — q_k31): the physical
    plan pre-limits each partition BEFORE the shuffle, so the per-task
    input is k rows, not the group's corpus share. Detection matches
    the WindowGroupLimit's partition attribute set against the
    Window's in the initial physical plan (present pre-execution —
    it's a planner rule, not AQE).
    """
    import re

    jplan = df._jdf.queryExecution().optimizedPlan()
    # partition-attr sets of every WindowGroupLimit in the physical plan
    phys = plan_string(df, "simple")
    grouplimit_keys: list[set[str]] = [
        set(re.findall(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", line.split("],")[0]))
        for line in phys.splitlines()
        if "WindowGroupLimit" in line
    ]
    offenders: list[str] = []

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "Window" and not node.partitionSpec().isEmpty():
            part_attrs = _attr_names(node.partitionSpec().mkString(","))
            if part_attrs and part_attrs <= set(_DIMENSION_COLS):
                if not any(part_attrs == ks for ks in grouplimit_keys):
                    kids = node.children()
                    if any(_corpus_sized(kids.apply(i)) for i in range(kids.size())):
                        offenders.append(node.simpleString(120))
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(jplan)
    return offenders


#: Join types whose output can EXCEED both inputs (row-multiplying).
#: Semi/anti joins bound output by the probe side and existence joins
#: dedup matches — they cannot go quadratic however hot a key is.
_MULTIPLYING_JOIN_TYPES = ("Inner", "Cross", "LeftOuter", "RightOuter", "FullOuter")


def _leaf_fact_tables(node) -> set[str]:
    """Fact-table signature columns of every leaf scan under ``node`` —
    identifies WHICH corpus tables a subtree reads (doc_id ->
    documents, vec_id -> embeddings, ...)."""
    kids = node.children()
    if kids.size() == 0:
        return _attr_names(node.output().mkString(",")) & set(_FACT_SIGNATURE_COLS)
    out: set[str] = set()
    for i in range(kids.size()):
        out |= _leaf_fact_tables(kids.apply(i))
    return out


def content_keyed_corpus_joins(df: DataFrame) -> list[str]:
    """Row-multiplying equi-joins whose BOTH sides are unreduced reads
    of the SAME corpus table and whose every equi-key is content-
    derived (no key references a per-row id) — the fourth tripwire
    shape (VERDICT r9 ask #1).

    Why this shape and only this shape: joining a corpus table to
    itself on a CONTENT key (a shingle hash, a word, a gram) makes one
    hot key with document frequency f contribute f² output rows — one
    "of the and"-class trigram and the exact-pair generators go
    quadratic at 100 TB. Keys that reference a row id are safe in any
    derivation: the id is unique per row, so a hash/affine rename of it
    is join-multiplicity-1 and a bucketing shape (``doc_id div 4096``)
    has a DECLARED width; either way one pair key touching a row id
    bounds the fan-out. Semi/anti joins are exempt by type (output ≤
    probe side — the LSH verify stage's pruning shape), and joins
    between DIFFERENT tables are the foreign-key lattice the relational
    queries live on.

    Returns the offending Join nodes' simpleStrings; [] == clean. The
    sweep in tests/test_plans.py runs this over every registered query
    and adjudicates survivors against a named ``JOIN_AUDIT_ALLOWLIST``
    with one-line contracts, mirroring the persist tripwire."""
    import re

    jplan = df._jdf.queryExecution().optimizedPlan()
    defs = _alias_defs(jplan)
    offenders: list[str] = []

    def key_is_row_bounded(attr_rendered: str) -> bool:
        # window specs shape frames, not the key's VALUE: a shingle
        # built via lead(w) OVER (PARTITION BY doc_id) is content, and
        # the spec's doc_id must not absolve it (the k83/k87 stripper)
        expanded = _strip_window_specs(_expand_refs(attr_rendered, defs))
        return bool(_attr_names(expanded) & set(_ROW_ID_COLS))

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "Join":
            jt = node.joinType().toString()
            cond = node.condition()
            if jt in _MULTIPLYING_JOIN_TYPES and cond.isDefined():
                pairs = re.findall(
                    r"([A-Za-z_][A-Za-z0-9_]*#\d+)L?\)?\s*=\s*"
                    r"\(?([A-Za-z_][A-Za-z0-9_]*#\d+)L?",
                    cond.get().toString(),
                )
                left = node.children().apply(0)
                right = node.children().apply(1)
                if (
                    pairs
                    and not any(
                        key_is_row_bounded(a) or key_is_row_bounded(b)
                        for a, b in pairs
                    )
                    and _leaf_fact_tables(left) & _leaf_fact_tables(right)
                    and _corpus_sized(left)
                    and _corpus_sized(right)
                ):
                    offenders.append(node.simpleString(160))
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(jplan)
    return offenders


def corpus_sized_plan(df: DataFrame) -> str | None:
    """The optimized-plan root's simpleString when corpus-size taint
    reaches it UNREDUCED — no Limit, and no Aggregate whose grouping
    drops per-row-id cardinality, on some path from a fact-table leaf
    — else None.

    This is the third tripwire shape (VERDICT r6 ask #4): a PERSISTED
    frame with such a plan pins O(corpus) rows in the block manager —
    fine as an sf0.1 audit, a memory-pressure trap at 100 TB (caches
    spill, but a 100 TB spill IS the failure). The sweep in
    tests/test_plans.py intercepts every ``persist()`` a registered
    query issues and flags offenders; declared audit queries are
    allowlisted BY NAME there so the exemption stays visible in code.
    """
    jplan = df._jdf.queryExecution().optimizedPlan()
    return jplan.simpleString(160) if _corpus_sized(jplan) else None
