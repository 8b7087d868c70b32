"""Mechanical derivation of the driver-sample head (_DRIVER_PRIORITY).

The driver's correctness sampler takes a PREFIX of ``queries()`` each
round (50 slots), so the registry iteration order is an evidence-
coverage rotation: stalest-evidence queries must lead. Round 8 showed
why hand-curating that head fails — q154 was rewritten (commit
8a44981) but the hand-built head missed it, so the rewrite shipped
with an r5-era driver verdict (round-8 VERDICT "what's wrong" #1).
This tool makes the rule mechanical. The principle: a driver verdict
is STALE iff the code it certifies changed after it was collected —
so each query's diff base is the boundary commit of the round it was
LAST SAMPLED in (q154's r8 rewrite is caught against its r5 verdict,
which a single "since last round" base would miss). Granularity is
the SYMBOL, not the module (a module-level rule marks ~40% of the
registry whenever dedup.py is touched, crowding the aging rotation
out of the 50-slot sample):

1. every query's latest driver verdict round comes from the
   CORRECTNESS_r*.json files the driver writes; round boundaries are
   the ``round N:`` commits;
2. per boundary, ``git diff`` → the top-level symbols (defs/classes/
   assigns) whose source segment actually differs;
3. reverse REFERENCE closure across the package (AST names +
   attribute refs — docstring prose does not propagate): a symbol
   whose body references a changed symbol is changed too, so a
   ``cachereg.rekey`` edit marks ``append_to_lsh_index`` marks
   ``q217_lsh_probe_append_cycle``;
4. a query is STALE if its function is in the closure for ITS OWN
   verdict's boundary, or references a closed-over symbol;
5. the head is: never-driver-sampled queries (new this round), then
   stale queries, then everyone else. Never/rest sort oldest-verdict
   first; STALE sorts by SPECIFICITY first (round-12 amendment, from
   the round-11 VERDICT: "staleness-by-change before
   staleness-by-age") — specificity(q) = the smallest fan-out among
   the changed symbols that mark q stale, where fan-out(s) = how many
   registry queries a change to s alone would mark. A query stale via
   `celled_neardup` (2 consumers) was the TARGET of a change and has
   never been driver-verified on it; a query stale only via a hub
   like `load_table` (every query) shares that risk with the entire
   registry, which the canary queries and full builder replays
   already exercise. Without this, one wide round (a session conf
   touch marks all 243) lets the oldest-verdict backlog crowd every
   just-rewritten operator out of the 50-slot sample — round 11's
   "what's wrong #1". Ties: oldest verdict, then registry order.

Usage:
    python tools/driver_priority.py              # per-query bases
    python tools/driver_priority.py --check      # verify queries.py's head
                                                 # prefix matches (CI gate)

Default output is the full ordered tuple, ready to paste into
queries._DRIVER_PRIORITY. ``--check`` exits nonzero if the current
_DRIVER_PRIORITY leaves any never-sampled or affected query outside
the first SAMPLE_SLOTS positions.
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "ssb_coefficient_maker_spark"
SAMPLE_SLOTS = 50  # the driver's per-round sample size

_WORD = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def last_round_commit() -> str:
    out = subprocess.run(
        ["git", "log", "--grep", r"^round [0-9]\+:", "-n", "1",
         "--format=%H"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    if not out:
        raise SystemExit("no 'round N:' commit found — pass --base")
    return out


def changed_files(base: str) -> set[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", f"{base}..HEAD"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    return {
        f for f in out if f.startswith(f"{PKG}/") and f.endswith(".py")
    }


def _toplevel_symbols(src: str) -> dict[str, str]:
    """name -> source segment for every top-level def/class/assign,
    plus every name BOUND BY a module-level import. (Line-sliced from
    ONE splitlines pass — ast.get_source_segment re-splits the source
    per node, which is quadratic on a 12k-line module and made the
    per-round diffs take minutes.)

    Two round-9-ADVICE closures: (a) def/class segments START AT THE
    FIRST DECORATOR (node.lineno is the ``def`` line, so a decorator
    edit was invisible to the diff); (b) imports are symbols too —
    rebinding ``from x import name`` to a different module changes
    every symbol that references ``name``, which the closure can only
    see if the import line itself diffs under ``name``. Import names
    are prefixed into the symbol table only as diff SEEDS; common
    aliases (F, np, pd) over-mark when their line changes, which is
    the tool's documented conservative direction."""
    out: dict[str, str] = {}
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return out
    lines = src.splitlines()

    def add(name: str, seg: str) -> None:
        # a name bound more than once (import + def, repeated assign)
        # maps to the CONCATENATION of its binding segments — a change
        # to any of them marks the name changed (conservative; the old
        # last-wins made edits to all but one binding invisible)
        out[name] = out[name] + "\n" + seg if name in out else seg

    for node in tree.body:
        start = node.lineno
        if (
            isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))
            and node.decorator_list
        ):
            start = min(start, node.decorator_list[0].lineno)
        seg = "\n".join(lines[start - 1 : node.end_lineno])
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            add(node.name, seg)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    add(t.id, seg)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            add(node.target.id, seg)
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for alias in node.names:
                add(alias.asname or alias.name.split(".")[0], seg)
    return out


def _referenced_names(seg: str) -> set[str]:
    """Names a symbol's code actually REFERENCES: ast.Name ids plus
    ast.Attribute attrs (so ``dedup.q215_...`` and ``cache.rekey(...)``
    both edge to their targets). AST-based, so docstrings and comments
    contribute nothing — a prose mention must not propagate
    "changed"."""
    try:
        tree = ast.parse(seg)
    except SyntaxError:
        return set(_WORD.findall(seg))
    names: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute):
            names.add(node.attr)
    return names


def changed_symbols(base: str) -> set[str]:
    """Top-level symbol names whose source differs between base and
    HEAD, across every changed package file. New files contribute all
    their symbols; deleted symbols count too (references to them are
    the breakage to re-sample)."""
    changed: set[str] = set()
    for f in changed_files(base):
        head_path = os.path.join(REPO, f)
        head_src = open(head_path).read() if os.path.exists(head_path) else ""
        proc = subprocess.run(
            ["git", "show", f"{base}:{f}"],
            cwd=REPO, capture_output=True, text=True,
        )
        base_src = proc.stdout if proc.returncode == 0 else ""
        a, b = _toplevel_symbols(base_src), _toplevel_symbols(head_src)
        for name in set(a) | set(b):
            if a.get(name) != b.get(name):
                changed.add(name)
    return changed


def _package_sources() -> dict[str, str]:
    out = {}
    for path in glob.glob(os.path.join(REPO, PKG, "**", "*.py"), recursive=True):
        out[path] = open(path).read()
    return out


_REFS_CACHE: dict[str, set[str]] | None = None


def _refs_graph() -> dict[str, set[str]]:
    global _REFS_CACHE
    if _REFS_CACHE is None:
        refs: dict[str, set[str]] = {}
        for _path, src in _package_sources().items():
            for name, seg in _toplevel_symbols(src).items():
                refs.setdefault(name, set()).update(
                    _referenced_names(seg) - {name}
                )
        _REFS_CACHE = refs
    return _REFS_CACHE


def symbol_closure(seed: set[str]) -> set[str]:
    """Reverse reference closure over every top-level symbol in the
    package: a symbol whose body mentions a closed-over name joins the
    closure. Names are matched unqualified (collisions over-mark —
    conservative by design)."""
    refs = _refs_graph()
    closure = set(seed)
    grew = True
    while grew:
        grew = False
        for name, words in refs.items():
            if name not in closure and words & closure:
                closure.add(name)
                grew = True
    return closure


_QREFS_CACHE: dict[str, tuple[str, set[str]]] | None = None


def _query_refs() -> dict[str, tuple[str, set[str]]]:
    """query name -> (fn name, referenced names), computed once."""
    global _QREFS_CACHE
    if _QREFS_CACHE is None:
        import inspect

        from ssb_coefficient_maker_spark.queries import REGISTRY

        out: dict[str, tuple[str, set[str]]] = {}
        for name, spec in REGISTRY.items():
            try:
                refs = _referenced_names(inspect.getsource(spec.fn))
            except OSError:
                refs = set()
            out[name] = (spec.fn.__name__, refs)
        _QREFS_CACHE = out
    return _QREFS_CACHE


def affected_queries(closure: set[str]) -> set[str]:
    """Registry queries whose function is in the closure or whose
    source references a closed-over symbol."""
    hit: set[str] = set()
    for name, (fn_name, refs) in _query_refs().items():
        if fn_name in closure or refs & closure:
            hit.add(name)
    return hit


def latest_verdicts() -> dict[str, int]:
    rounds: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        for q in data:
            rounds[q] = max(rounds.get(q, 0), rnd)
    return rounds


def round_boundaries() -> dict[int, str]:
    """Commit hash of every ``round N:`` commit — the tree state a
    round's driver verdicts certify."""
    out = subprocess.run(
        ["git", "log", "--grep", r"^round [0-9]\+:", "--format=%H %s"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    bounds: dict[int, str] = {}
    for line in out:
        sha, _, subj = line.partition(" ")
        m = re.match(r"round (\d+):", subj)
        if m:
            bounds.setdefault(int(m.group(1)), sha)
    return bounds


_REVERSE_CACHE: dict[str, set[str]] | None = None


def _reverse_graph() -> dict[str, set[str]]:
    """referenced name -> the top-level symbols whose body mentions
    it (the reverse of _refs_graph, built once)."""
    global _REVERSE_CACHE
    if _REVERSE_CACHE is None:
        rev: dict[str, set[str]] = {}
        for name, words in _refs_graph().items():
            for w in words:
                rev.setdefault(w, set()).add(name)
        _REVERSE_CACHE = rev
    return _REVERSE_CACHE


_FANOUT_CACHE: dict[str, tuple[int, set[str]]] = {}


def _symbol_fanout(sym: str) -> tuple[int, set[str]]:
    """(how many registry queries a change to `sym` alone would mark
    stale, the marked set). BFS over the reverse reference graph —
    equivalent to affected_queries(symbol_closure({sym})) but linear,
    so per-symbol specificity over hundreds of changed symbols stays
    cheap. Round-independent (computed on the CURRENT reference
    graph), hence cached by name."""
    if sym not in _FANOUT_CACHE:
        rev = _reverse_graph()
        closure = {sym}
        frontier = [sym]
        while frontier:
            nxt = []
            for s in frontier:
                for referrer in rev.get(s, ()):
                    if referrer not in closure:
                        closure.add(referrer)
                        nxt.append(referrer)
            frontier = nxt
        hit = affected_queries(closure)
        _FANOUT_CACHE[sym] = (len(hit), hit)
    return _FANOUT_CACHE[sym]


def stale_queries(verdicts: dict[str, int]) -> tuple[set[str], dict[str, int]]:
    """(stale set, specificity map). Stale: the symbol closure of the
    diff from the query's own verdict boundary reaches it. One diff
    per distinct verdict round; a verdict round with no boundary
    commit is treated as maximally stale (can't prove the evidence
    still covers the code). Specificity: min fan-out over the changed
    symbols that individually mark the query — small means the change
    was targeted at this query's code path (see module docstring,
    step 5)."""
    bounds = round_boundaries()
    nq = len(_query_refs())
    stale: set[str] = set()
    spec: dict[str, int] = {}
    for rnd in sorted({r for r in verdicts.values()}):
        members = {q for q, r in verdicts.items() if r == rnd}
        base = bounds.get(rnd)
        if base is None:
            stale |= members
            for q in members:
                spec[q] = min(spec.get(q, nq), nq)
            continue
        changed = changed_symbols(base)
        affected = affected_queries(symbol_closure(changed))
        hit = members & affected
        stale |= hit
        for sym in changed:
            n, marked = _symbol_fanout(sym)
            for q in marked & hit:
                spec[q] = min(spec.get(q, nq), n)
        for q in hit:
            # affected via closure interactions not attributable to a
            # single symbol (shouldn't happen; keep the key total)
            spec.setdefault(q, nq)
    return stale, spec


# The round-11 VERDICT names the queries the round-12 driver sample
# must lead with. Two of them — q57, q220 — the specificity rule
# EXCLUDES on evidence (the only changed symbol marking either is the
# `load_table` hub: q57 is the embedding-LSH tier in similarity.py,
# untouched by the round-11 minhash/CC rewrites; q220 is the triplet
# path, untouched by the matrix right-sizing). The verdict's grouping
# was over-inclusive there, but its requirement is explicit, so they
# are pinned at specificity 50 (after every genuine targeted change,
# ahead of the hub-only backlog). The pin SELF-EXPIRES: once a query
# gains a driver verdict from round >= 12 it competes normally again.
_R11_VERDICT_PINS = ("q57_lsh_neardup", "q220_neumann_flow_reach")
_PIN_EXPIRY_ROUND = 12


def derive() -> tuple[list[str], dict]:
    from ssb_coefficient_maker_spark.queries import REGISTRY

    verdicts = latest_verdicts()
    stale, spec = stale_queries(verdicts)
    order = {name: i for i, name in enumerate(REGISTRY)}

    def key(name: str):
        return (verdicts.get(name, 0), order[name])

    def stale_key(name: str):
        s = spec.get(name, len(REGISTRY))
        if (
            name in _R11_VERDICT_PINS
            and verdicts.get(name, 0) < _PIN_EXPIRY_ROUND
        ):
            s = min(s, 50)
        return (s, verdicts.get(name, 0), order[name])

    never = sorted((n for n in REGISTRY if n not in verdicts), key=key)
    st = sorted(
        (n for n in REGISTRY if n in stale and n in verdicts), key=stale_key
    )
    rest = sorted(
        (n for n in REGISTRY if n not in stale and n in verdicts), key=key
    )
    info = {
        "stale": stale,
        "never": never,
        "verdicts": verdicts,
        "specificity": spec,
    }
    return never + st + rest, info


def main() -> int:
    args = sys.argv[1:]
    check = False
    while args:
        a = args.pop(0)
        if a == "--check":
            check = True
        else:
            raise SystemExit(f"unknown arg {a!r}")
    ordered, info = derive()
    if check:
        from ssb_coefficient_maker_spark.queries import queries

        current = list(queries())
        must = set(info["never"]) | (
            info["stale"] & set(ordered[:SAMPLE_SLOTS])
        )
        current_head = set(current[:SAMPLE_SLOTS])
        missing = must - current_head
        if missing:
            print(
                f"STALE HEAD: {len(missing)} never-sampled/stale "
                f"queries missing from the first {SAMPLE_SLOTS} slots:"
            )
            for n in sorted(missing):
                print(f"  {n}")
            print("regenerate with: python tools/driver_priority.py")
            return 1
        print(
            f"head ok: first {SAMPLE_SLOTS} slots cover all "
            f"{len(info['never'])} never-sampled and the prioritized "
            f"{len(info['stale'])} stale queries"
        )
        return 0
    print(
        f"# {len(info['never'])} never-sampled, {len(info['stale'])} "
        "stale (code changed since their verdict); paste into "
        "_DRIVER_PRIORITY"
    )
    print("_DRIVER_PRIORITY = (")
    for n in ordered:
        print(f'    "{n}",')
    print(")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
