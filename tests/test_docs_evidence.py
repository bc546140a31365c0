"""Evidence-chain guard: every measurement artifact cited by the docs exists.

VERDICT r4 weak #1: round-4 docs cited `docs/artifacts/baseline_r4.log`,
`docs/artifacts/breakdown_r4.log` and `docs/tpu_lane_r4.log` while none of
the three was ever committed (the logs lived in the gitignored `runs/` dir).
The project's convention of citing evidence per claim is only worth something
if the citations resolve — this test makes a dangling citation a test
failure, so it can never be committed again.

Scope: any path under ``docs/artifacts/`` and any ``docs/tpu_lane_*.log``
mentioned in the checked-in markdown (docs/*.md, README.md, *.md at the repo
root except judge-authored VERDICT/ADVICE which may legitimately describe
paths that no longer exist).
"""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# judge/advisor-authored or historical-by-design files whose prose may
# describe paths that were never (or are no longer) in the tree
EXEMPT = {"VERDICT.md", "ADVICE.md", "SURVEY.md"}

CITE = re.compile(
    r"(?:docs/artifacts/[\w\-.]+(?:/[\w\-.]+)*|docs/tpu_lane_[\w\-.]*\.log)"
)


def _cited_paths():
    md = sorted(REPO.glob("docs/**/*.md")) + sorted(REPO.glob("*.md"))
    out = []
    for f in md:
        if f.name in EXEMPT:
            continue
        for m in CITE.finditer(f.read_text(errors="replace")):
            path = m.group(0).rstrip(".,;:)")
            out.append((f.relative_to(REPO), path))
    return out


def test_artifacts_dir_exists():
    assert (REPO / "docs" / "artifacts").is_dir()


def test_every_cited_artifact_exists():
    dangling = [
        f"{src}: {path}"
        for src, path in _cited_paths()
        if not (REPO / path).exists()
    ]
    assert not dangling, "dangling evidence citations:\n" + "\n".join(dangling)


def test_the_scanner_actually_sees_citations():
    # guard the guard: if the regex or glob ever breaks, citations would
    # vanish silently and the test above would pass vacuously
    assert len(_cited_paths()) >= 1
