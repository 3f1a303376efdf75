#!/usr/bin/env python
"""Driver-window hygiene tool (VERDICT r3 item 3).

The external driver verifies only the FIRST 50 entries of ``queries()``
per round, so the ordering of the registry IS the verification plan.
Rounds 1-3 curated that list by hand; this tool automates it so no entry
can silently miss its turn:

* ``snapshot``   — sha256 per registry entry over the query-fn source
                   PLUS the source file of every in-package object the fn
                   references (resolved through ``fn.__globals__`` for
                   module-level imports and same-module helpers, plus a
                   regex pass for imports inlined in the fn body), so a
                   shared-helper edit marks every dependent entry dirty.
                   ``registry.py`` itself is excluded: the registration
                   mechanism carries no query semantics, and hashing it
                   would mark ALL entries dirty on every window rotation.
* ``state``      — ``tools/window_state.json``: per entry, the hash at
                   last driver green and the round that green happened
                   (latest CORRECTNESS_r*.json verdict wins; a rows-only
                   ``no_oracle`` record counts as its declared weaker
                   green).
* ``emit``       — the front-load list, deterministic:
                   (1) never-checked (no green in any round),
                   (2) changed-since-green (current hash != green hash),
                   (3) oldest-green ballast (ascending green round,
                   registration order within a round), capped at
                   ``--limit`` (default 50, the driver window).
                   Written to ``s3_kinesis_replay_spark/window.json``
                   which the registry loads and asserts against.

Usage:
  python tools/window_tool.py update-green   # after a CORRECTNESS lands
  python tools/window_tool.py emit           # regenerate window.json
  python tools/window_tool.py check          # exit 1 if window.json stale
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
import re
import sys
import textwrap
from pathlib import Path

# SKR_REPO_ROOT lets this script hash a DIFFERENT checkout's package (e.g.
# a git worktree at the last-green commit) to rebuild baseline hashes.
REPO = Path(os.environ.get("SKR_REPO_ROOT") or Path(__file__).resolve().parent.parent)
sys.path.insert(0, str(REPO))

STATE_PATH = REPO / "tools" / "window_state.json"
WINDOW_PATH = REPO / "s3_kinesis_replay_spark" / "window.json"
PKG = REPO / "s3_kinesis_replay_spark"

_HELPER_RE = re.compile(
    r"(?:from\s+s3_kinesis_replay_spark\.(operators|streaming|sources)"
    r"\s+import\s+([\w, ]+))"
    r"|(?:from\s+s3_kinesis_replay_spark\.(operators|streaming|sources)\.(\w+)\s+import)"
    r"|(?:\b(operators|streaming|sources)\.(\w+)\b)"
)


def _registration_order() -> dict:
    """The raw module-registration-order registry (NOT window-reordered)."""
    from s3_kinesis_replay_spark import registry as reg

    reg.all_queries()  # trigger module imports / registration
    return dict(reg._REGISTRY)


def _helper_modules(src: str) -> list[Path]:
    """Helper module files under operators/ streaming/ sources/ that the
    query-fn source references, by import statement or dotted use."""
    mods: set[Path] = set()
    for m in _HELPER_RE.finditer(src):
        if m.group(1):  # from pkg.operators import a, b
            for name in m.group(2).split(","):
                p = PKG / m.group(1) / f"{name.strip()}.py"
                if p.exists():
                    mods.add(p)
        elif m.group(3):  # from pkg.operators.mod import ...
            p = PKG / m.group(3) / f"{m.group(4)}.py"
            if p.exists():
                mods.add(p)
        elif m.group(5):  # operators.mod attr use
            p = PKG / m.group(5) / f"{m.group(6)}.py"
            if p.exists():
                mods.add(p)
    return sorted(mods)


def _global_dep_files(fn, src: str) -> list[Path]:
    """Package source files reachable from the fn through its globals:
    every identifier in the fn body that resolves (via ``fn.__globals__``)
    to an in-package module, or to a function/class defined in one,
    contributes that module's file — including the fn's own defining
    module when it calls same-module helpers. registry.py is excluded
    (registration mechanics, no query semantics)."""
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:  # pragma: no cover - fn source always parses
        return []
    names = {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}
    files: set[Path] = set()
    g = getattr(fn, "__globals__", {})
    for name in names:
        obj = g.get(name)
        if obj is None:
            continue
        mod = obj if inspect.ismodule(obj) else inspect.getmodule(obj)
        f = getattr(mod, "__file__", None)
        if f and "s3_kinesis_replay_spark" in f and not f.endswith("registry.py"):
            files.add(Path(f))
    return sorted(files)


def _mod_to_file(dotted: str) -> Path | None:
    rel = dotted.split(".")[1:]  # drop the package root segment
    if not rel:
        return None
    p = PKG.joinpath(*rel).with_suffix(".py")
    if p.exists():
        return p
    p = PKG.joinpath(*rel) / "__init__.py"
    if p.exists():
        return p
    if len(rel) > 1:  # from pkg.mod import NAME — NAME is not a module
        p = PKG.joinpath(*rel[:-1]).with_suffix(".py")
        if p.exists():
            return p
    return None


def _module_graph() -> dict[Path, set[Path]]:
    """file -> package files it imports (incl. imports inside functions)."""
    graph: dict[Path, set[Path]] = {}
    for f in sorted(PKG.rglob("*.py")):
        deps: set[Path] = set()
        tree = ast.parse(f.read_text())
        for node in ast.walk(tree):
            dotted: list[str] = []
            if isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(
                "s3_kinesis_replay_spark"
            ):
                dotted.append(node.module)
                dotted.extend(f"{node.module}.{a.name}" for a in node.names)
            elif isinstance(node, ast.Import):
                dotted.extend(
                    a.name
                    for a in node.names
                    if a.name.startswith("s3_kinesis_replay_spark")
                )
            for d in dotted:
                p = _mod_to_file(d)
                if p is not None and p != f:
                    deps.add(p)
        graph[f] = deps
    return graph


def _closure(files: set[Path], graph: dict[Path, set[Path]]) -> set[Path]:
    out, stack = set(), list(files)
    while stack:
        f = stack.pop()
        if f in out:
            continue
        out.add(f)
        stack.extend(graph.get(f, ()))
    return out


def snapshot() -> dict[str, str]:
    """name -> hex digest over fn source + the TRANSITIVE closure of
    package files it depends on (direct refs via globals/inline imports,
    then the module import graph), so an edit anywhere in an operator's
    implementation chain marks every dependent query dirty."""
    graph = _module_graph()
    registry_file = PKG / "registry.py"
    out: dict[str, str] = {}
    for name, q in _registration_order().items():
        src = inspect.getsource(q.fn)
        h = hashlib.sha256(src.encode())
        direct = set(_helper_modules(src)) | set(_global_dep_files(q.fn, src))
        for mod in sorted(_closure(direct, graph) - {registry_file}):
            h.update(mod.read_bytes())
        out[name] = h.hexdigest()[:16]
    return out


def _green_rounds() -> dict[str, int]:
    """Latest driver verdict per entry: round of the most recent green.

    Green = hash_match true, OR a declared rows-only record (err ==
    'no_oracle' with a row count) — the weaker green those entries can
    ever earn. A FAIL/ERR in a later round erases an earlier green.
    """
    greens: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        for name, rec in json.loads(path.read_text()).items():
            ok = rec.get("hash_match") is True or (
                rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None
            )
            if ok:
                greens[name] = rnd
            else:
                greens.pop(name, None)
    return greens


def load_state() -> dict:
    if STATE_PATH.exists():
        state = json.loads(STATE_PATH.read_text())
        state.setdefault("rounds_seen", [])
        return state
    return {"green_hash": {}, "green_round": {}, "rounds_seen": []}


def unseen_rounds() -> list[int]:
    """CORRECTNESS rounds on disk that update-green has not ingested —
    non-empty means the state's hashes may postdate code edits, so run
    `python tools/window_tool.py update-green` BEFORE changing code."""
    state = load_state()
    on_disk = [
        int(re.search(r"r(\d+)", p.name).group(1))
        for p in REPO.glob("CORRECTNESS_r*.json")
    ]
    return sorted(set(on_disk) - set(state["rounds_seen"]))


def update_green() -> dict:
    """Refresh state from CORRECTNESS files: every newly-green entry
    records its hash AT THE EMIT THE DRIVER VERIFIED — looked up in the
    per-round history ``emit_hashes_by_round[round]`` (written by
    write_window, keyed by the round whose CORRECTNESS that emit will
    feed), falling back to the legacy single ``last_emit_hashes`` and
    finally to the current hash only for entries no emit ever saw
    (fresh clone edge case). The driver verifies the tree committed when
    the window was generated, so those are the verified hashes even if
    this command runs after round-N+1 edits have already landed.
    """
    cur = snapshot()
    greens = _green_rounds()
    state = load_state()
    by_round = state.get("emit_hashes_by_round", {})
    last = state.get("last_emit_hashes") or cur
    for name, rnd in greens.items():
        prev_round = state["green_round"].get(name)
        if prev_round != rnd or name not in state["green_hash"]:
            verified = by_round.get(str(rnd), last)
            state["green_hash"][name] = verified.get(name, cur.get(name, ""))
            state["green_round"][name] = rnd
    # drop entries that no longer exist in the registry
    state["green_hash"] = {k: v for k, v in state["green_hash"].items() if k in cur}
    state["green_round"] = {k: v for k, v in state["green_round"].items() if k in cur}
    state["rounds_seen"] = sorted(
        set(state.get("rounds_seen", []))
        | {
            int(re.search(r"r(\d+)", p.name).group(1))
            for p in REPO.glob("CORRECTNESS_r*.json")
        }
    )
    STATE_PATH.write_text(json.dumps(state, indent=1, sort_keys=True) + "\n")
    return state


def emit(limit: int = 50) -> list[str]:
    """Deterministic front-load list for the next driver window."""
    cur = snapshot()
    state = load_state()
    reg_order = list(_registration_order())

    never = [n for n in reg_order if n not in state["green_round"]]
    changed = [
        n
        for n in reg_order
        if n in state["green_round"] and state["green_hash"].get(n) != cur[n]
    ]
    taken = set(never) | set(changed)
    ballast = sorted(
        (n for n in reg_order if n not in taken),
        key=lambda n: (state["green_round"][n], reg_order.index(n)),
    )
    window = (never + changed + ballast)[:limit]
    return window


def write_window(limit: int = 50, force: bool = False) -> list[str]:
    # Refuse to emit over un-ingested driver results: if a CORRECTNESS
    # round landed that update-green has not seen, overwriting the emit
    # hashes here would make update-green record POST-edit hashes as
    # "driver-verified" — code the driver never saw would be marked green
    # and silently drop out of the re-verify window (ADVICE r4, medium).
    pending = unseen_rounds()
    if pending and not force:
        sys.exit(
            f"REFUSING emit: CORRECTNESS rounds {pending} not yet ingested.\n"
            "Run `python tools/window_tool.py update-green` first "
            "(or pass --force if you know the emit hashes are still valid)."
        )
    window = emit(limit)
    WINDOW_PATH.write_text(
        json.dumps({"first": window, "limit": limit}, indent=1) + "\n"
    )
    # snapshot the hashes this window was generated against: the driver
    # verifies the round-end committed tree, so THESE are the hashes a
    # later update-green must record for newly-green entries. Keyed by
    # the round this emit will feed (max round seen so far + 1) so a
    # late-running update-green can still find the right snapshot even
    # after further emits.
    state = load_state()
    hashes = snapshot()
    state["last_emit_hashes"] = hashes
    next_round = max(
        set(state.get("rounds_seen", []))
        | {
            int(re.search(r"r(\d+)", p.name).group(1))
            for p in REPO.glob("CORRECTNESS_r*.json")
        }
        | {0},
    ) + 1
    history = state.setdefault("emit_hashes_by_round", {})
    history[str(next_round)] = hashes
    # keep the history bounded: only rounds not yet ingested matter
    for k in sorted(history, key=int)[:-8]:
        del history[k]
    STATE_PATH.write_text(json.dumps(state, indent=1, sort_keys=True) + "\n")
    return window


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "emit"
    if cmd == "update-green":
        state = update_green()
        print(f"state: {len(state['green_round'])} greens recorded")
    elif cmd == "snapshot-json":
        # machine-readable hashes — run with SKR_REPO_ROOT=<worktree> to
        # extract baseline hashes from a historical checkout
        print(json.dumps(snapshot(), indent=0, sort_keys=True))
    elif cmd == "rebase-hashes":
        # replace stored green hashes with ones from a snapshot-json file
        # (keeps green rounds): used when the hash ALGORITHM changes and
        # baselines must be recomputed against the last-green tree
        hashes = json.loads(Path(sys.argv[2]).read_text())
        state = load_state()
        state["green_hash"] = {
            k: hashes[k]
            for k in state["green_round"]
            if k in hashes
        }
        STATE_PATH.write_text(json.dumps(state, indent=1, sort_keys=True) + "\n")
        print(f"rebased {len(state['green_hash'])} green hashes")
    elif cmd == "emit":
        window = write_window(force="--force" in sys.argv[2:])
        print(f"window.json: {len(window)} entries; head={window[:5]}")
    elif cmd == "check":
        want = emit()
        have = (
            json.loads(WINDOW_PATH.read_text())["first"]
            if WINDOW_PATH.exists()
            else []
        )
        if want != have:
            print("window.json STALE — run `python tools/window_tool.py emit`")
            print(f" want head: {want[:8]}")
            print(f" have head: {have[:8]}")
            sys.exit(1)
        print("window.json up to date")
    else:
        sys.exit(f"unknown command {cmd!r}")


if __name__ == "__main__":
    main()
