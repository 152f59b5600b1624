"""Per-entry provenance hashes for the gate rotation (VERDICT r7 #8).

tools/gate_rotation.py previously trusted queries.py comments to know
which entries' CODE changed since their last driver green — a hand-run
git question. This tool makes the changed-set mechanical:

    python tools/gate_manifest.py --update   # end of round, on final code
    python tools/gate_manifest.py            # diff current code vs manifest

Each entry's hash covers, in order of decreasing fidelity:
  1. the registered query function's SOURCE (inspect.getsource — covers
     the Spark-side plan construction and the entry's parameters);
  2. its ORACLE SQL string, fully expanded (oracle-builder helpers are
     captured through their OUTPUT, so a changed SQL fragment changes
     every entry that embeds it — no need to hash the builders);
  3. the file hash of every ``sketchlib.*`` module the function imports —
     fn-local imports PLUS the defining module's column-0 top-level
     imports (entries that lean on top-of-file imports, like the cf_*
     family's sketchlib.spark.cuckoo, would otherwise carry zero module
     coverage). The operator library the entry drives: a similarity.py
     edit fronts every ann_* entry — deliberately conservative, one
     level deep; the
     deeper kernels are version-tokened through sketchlib/cache.py, so a
     semantic kernel change already surfaces as a changed cache path in
     the entry plan, and pure refactors there are what the two-round
     green rotation exists to re-verify anyway).

GATE_MANIFEST.json is committed at the END of each round on final code —
the state the driver gated — so next round's diff is exactly "changed
since the code the last greens attest to". Entries missing from the
manifest are treated as changed (new entries front as never-green
regardless).
"""

from __future__ import annotations

import hashlib
import importlib
import inspect
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANIFEST_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "GATE_MANIFEST.json"
)

_MOD_RE = re.compile(r"(?:from|import)\s+(sketchlib(?:\.\w+)+)")
#: module-LEVEL (column-0) sketchlib imports of the entry's defining
#: module: entries that use top-of-file imports (the cf_* family's
#: sketchlib.spark.cuckoo) would otherwise carry zero module coverage —
#: the exact miss this tool exists to close. Column-0 anchoring keeps the
#: fn-local imports of OTHER entries in the same file out of every hash.
_TOP_MOD_RE = re.compile(r"^(?:from|import)\s+(sketchlib(?:\.\w+)+)", re.M)

#: the registry modules themselves are NOT hashed as module coverage:
#: an entry's own source + fully-expanded oracle already capture what it
#: takes from them, and hashing them would couple EVERY entry to pure
#: rotation bookkeeping (_GATE_FRONT reorders) — flagging all 95 as
#: changed on any window edit, which would make the tool useless.
_REGISTRY_MODULES = {"sketchlib.queries", "sketchlib.queries_data"}


def _module_file_hash(modname: str, cache: dict[str, str]) -> str:
    if modname not in cache:
        try:
            mod = importlib.import_module(modname)
            with open(mod.__file__, "rb") as f:
                cache[modname] = hashlib.sha256(f.read()).hexdigest()
        except Exception:
            cache[modname] = "unresolvable"
    return cache[modname]


def compute_hashes() -> dict[str, dict]:
    """entry -> {hash, modules} over the LIVE registry."""
    import sketchlib.queries_data  # noqa: F401 — registers pipeline queries
    from sketchlib.queries import REGISTRY

    mod_cache: dict[str, str] = {}
    top_cache: dict[str, list[str]] = {}
    out: dict[str, dict] = {}
    for name, (fn, oracle) in REGISTRY.items():
        src = inspect.getsource(fn)
        home = fn.__module__
        if home not in top_cache:
            top_cache[home] = _TOP_MOD_RE.findall(
                inspect.getsource(sys.modules[home])
            )
        mods = sorted(
            (set(_MOD_RE.findall(src)) | set(top_cache[home]))
            - _REGISTRY_MODULES
        )
        h = hashlib.sha256()
        h.update(src.encode())
        h.update(b"\x00")
        h.update((oracle or "").encode())
        for m in mods:
            h.update(b"\x00")
            h.update(f"{m}:{_module_file_hash(m, mod_cache)}".encode())
        out[name] = {"hash": h.hexdigest(), "modules": mods}
    return out


def load_manifest() -> dict[str, dict]:
    if not os.path.exists(MANIFEST_PATH):
        return {}
    with open(MANIFEST_PATH) as f:
        return json.load(f)


def changed_entries() -> tuple[list[str], list[str]]:
    """(changed, missing-from-manifest) vs the committed manifest."""
    cur = compute_hashes()
    man = load_manifest()
    changed = [n for n in cur if n in man and man[n]["hash"] != cur[n]["hash"]]
    missing = [n for n in cur if n not in man]
    return sorted(changed), sorted(missing)


def main() -> None:
    if "--update" in sys.argv:
        cur = compute_hashes()
        with open(MANIFEST_PATH, "w") as f:
            json.dump(cur, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {MANIFEST_PATH} ({len(cur)} entries)")
        return
    changed, missing = changed_entries()
    print(f"manifest: {MANIFEST_PATH} ({'present' if os.path.exists(MANIFEST_PATH) else 'MISSING'})")
    print(f"\nchanged since manifest ({len(changed)}):")
    for n in changed:
        print(f"  {n}")
    print(f"\nnot in manifest ({len(missing)}):")
    for n in missing:
        print(f"  {n}")


if __name__ == "__main__":
    main()
