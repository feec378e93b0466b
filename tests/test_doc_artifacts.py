"""tools/check_doc_artifacts.py: citation parsing + dangling detection.

The checker makes VERDICT r03's dangling-citation class (docs or code
citing docs/results artifacts that do not exist) mechanically impossible
to ship; these tests pin its parsing semantics on a synthetic repo.
"""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.check_doc_artifacts import expand_braces, main  # noqa: E402


def test_expand_plain():
    assert expand_braces("docs/results/a.json") == ["docs/results/a.json"]


def test_expand_numeric_range():
    assert expand_braces("docs/results/c{0..2}.json") == [
        "docs/results/c0.json", "docs/results/c1.json",
        "docs/results/c2.json"]


def test_expand_comma_set_nested():
    assert sorted(expand_braces("d/t{3,6}_{a,b}.json")) == [
        "d/t3_a.json", "d/t3_b.json", "d/t6_a.json", "d/t6_b.json"]


def test_expand_placeholder_is_none():
    assert expand_braces("docs/results/g{g:g}.json") is None
    assert expand_braces("docs/results/x{N}.json") is None


def _mk_repo(tmp_path, readme_text):
    (tmp_path / "docs" / "results" / "ok").mkdir(parents=True)
    (tmp_path / "docs" / "results" / "ok" / "a.json").write_text("{}")
    (tmp_path / "music_style_transfer_ldm_tpu").mkdir()
    (tmp_path / "tools").mkdir()
    (tmp_path / "README.md").write_text(readme_text)
    return tmp_path


def test_clean_repo_passes(tmp_path, capsys):
    _mk_repo(tmp_path, "see docs/results/ok/a.json and docs/results/ok\n")
    assert main(["--repo", str(tmp_path)]) == 0


def test_dangling_file_fails(tmp_path, capsys):
    _mk_repo(tmp_path, "see docs/results/ok/missing.json\n")
    assert main(["--repo", str(tmp_path)]) == 1
    assert "missing.json" in capsys.readouterr().out


def test_dangling_dir_fails(tmp_path, capsys):
    _mk_repo(tmp_path, "summarize docs/results/guidance please\n")
    assert main(["--repo", str(tmp_path)]) == 1
    assert "docs/results/guidance/" in capsys.readouterr().out


def test_allow_missing(tmp_path):
    _mk_repo(tmp_path, "pending docs/results/guidance/g1.json\n")
    assert main(["--repo", str(tmp_path),
                 "--allow-missing", "guidance/"]) == 0


def test_brace_citation_checked(tmp_path, capsys):
    _mk_repo(tmp_path, "see docs/results/ok/c{0..1}.json\n")
    (tmp_path / "docs" / "results" / "ok" / "c0.json").write_text("{}")
    # c1 missing -> dangling
    assert main(["--repo", str(tmp_path)]) == 1
    assert "c1.json" in capsys.readouterr().out


def test_real_repo_is_consistent():
    """The committed repo itself must have no dangling citations."""
    assert main(["--repo", str(REPO)]) == 0


def test_wall_time_claim_checked(tmp_path):
    """A doc wall-time claim outside the committed report's measurement
    (±25%) is flagged; a truthful claim passes (VERDICT r04 #8)."""
    import json

    from tools.check_doc_artifacts import check_wall_time_claims

    (tmp_path / "release_check_report.json").write_text(json.dumps(
        {"suite": {"tail": "....\n291 passed in 950.12s (0:15:50)"}}))
    claude = tmp_path / "CLAUDE.md"

    claude.write_text("tests run: full run ~3-4 min on this machine")
    problems = check_wall_time_claims(tmp_path)
    assert len(problems) == 1 and "~3-4 min" in problems[0]

    claude.write_text("tests run: full run ~16-17 min on this machine")
    assert check_wall_time_claims(tmp_path) == []

    # No report: nothing to verify against, nothing flagged.
    (tmp_path / "release_check_report.json").unlink()
    assert check_wall_time_claims(tmp_path) == []
