#!/usr/bin/env python3
"""Regenerate LEAKCHECK.json: grep src/ and tools/ for categories of
content that must never appear in this repo (non-public imports, private
URLs/buckets, chat links, credentials, suspicious env vars). Zero hits is
the expected steady state; the artifact exists so each round's tree
carries its own freshly-generated evidence instead of a stale header.

Usage: python3 tools/leakcheck.py <round_number>
"""
import json
import os
import re
import sys

ROOTS = ["src", "tools", "build.sbt"]

# Generic leak signatures. Each category is a list of regexes; a hit
# records file:line:category. Patterns are deliberately broad — a false
# positive costs a minute of review, a false negative costs trust.
PATTERNS = {
    "internal-import": [
        r"^\s*import\s+(?!java\.|javax\.|scala\.|org\.apache\.|graft\.|org\.scalatest|org\.scalacheck|org\.slf4j|com\.fasterxml)"
        r"[a-z][\w.]*\.(internal|corp|private)\b",
    ],
    "internal-url": [
        r"https?://(?!localhost|127\.0\.0\.1|www\.w3\.org|github\.com|spark\.apache\.org|duckdb\.org|arxiv\.org|aclanthology\.org|dl\.acm\.org|en\.wikipedia\.org)[\w.-]*\.(corp|internal|intranet)\b",
    ],
    "internal-pkg2": [
        r"\b(?:com|net|io)\.[a-z]+\.(secret|internal)[\w.]*",
    ],
    "internal-bucket": [
        r"\b(?:s3|s3a|s3n|gs|abfss?)://[\w.-]+",
    ],
    "slack-link": [
        r"slack\.com/archives", r"\B#[a-z0-9-]*-(?:eng|oncall|alerts)\b",
    ],
    "api-key": [
        r"\b(?:sk|pk|rk)-[A-Za-z0-9]{20,}", r"AKIA[0-9A-Z]{16}",
        r"(?i)api[_-]?key\s*[:=]\s*['\"][A-Za-z0-9+/]{16,}",
    ],
    "axon-env": [
        r"(?i)\b(?:AXON|CORP|INTERNAL)_[A-Z0-9_]*(?:TOKEN|KEY|SECRET|URL)\b",
    ],
}


def iter_files():
    for root in ROOTS:
        if os.path.isfile(root):
            yield root
            continue
        for dirpath, _, names in os.walk(root):
            for n in names:
                if n.endswith((".scala", ".py", ".sh", ".sbt", ".json",
                               ".md", ".sql")):
                    yield os.path.join(dirpath, n)


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    compiled = {c: [re.compile(p) for p in ps]
                for c, ps in PATTERNS.items()}
    hits = {c: [] for c in PATTERNS}
    for path in iter_files():
        try:
            with open(path, errors="replace") as f:
                for ln, line in enumerate(f, 1):
                    for cat, regs in compiled.items():
                        for r in regs:
                            if r.search(line):
                                hits[cat].append(f"{path}:{ln}")
        except OSError:
            pass
    out = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open("LEAKCHECK.json", "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({"round": rnd,
                      "n_hits": out["n_hits"]}))


if __name__ == "__main__":
    main()
