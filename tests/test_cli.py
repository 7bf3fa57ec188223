"""CLI tests using click's CliRunner (mirrors the reference's CLI suite)."""

from unittest import mock

import pytest
from click.testing import CliRunner

from instagraal_tpu.cli import endtoend, main as main_cli, polish, post, pre, stats


@pytest.fixture
def runner():
    return CliRunner()


class TestHelp:
    @pytest.mark.parametrize(
        "cmd",
        [pre.main, main_cli.main, polish.main, post.main, stats.main,
         endtoend.main],
    )
    def test_help(self, runner, cmd):
        result = runner.invoke(cmd, ["--help"])
        assert result.exit_code == 0
        assert "Usage" in result.output


class TestPreCli:
    def test_runs_on_toy(self, runner, toy_assembly, tmp_path):
        result = runner.invoke(
            pre.main,
            [
                str(toy_assembly["fasta"]),
                str(toy_assembly["pairs"]),
                "-e",
                "DpnII",
                "-o",
                str(tmp_path),
            ],
        )
        assert result.exit_code == 0, result.output
        assert (tmp_path / "fragments_list.txt").exists()

    def test_unknown_enzyme_fails(self, runner, toy_assembly, tmp_path):
        result = runner.invoke(
            pre.main,
            [
                str(toy_assembly["fasta"]),
                str(toy_assembly["pairs"]),
                "-e",
                "NopeZyme",
                "-o",
                str(tmp_path),
            ],
        )
        assert result.exit_code != 0


class TestStatsCli:
    def test_single(self, runner, toy_assembly):
        result = runner.invoke(stats.main, [str(toy_assembly["fasta"])])
        assert result.exit_code == 0
        assert "N50" in result.output

    def test_comparison(self, runner, toy_assembly):
        result = runner.invoke(
            stats.main,
            [
                str(toy_assembly["fasta"]),
                str(toy_assembly["fasta"]),
                "-l",
                "a,b",
            ],
        )
        assert result.exit_code == 0
        assert "a" in result.output and "b" in result.output

    def test_label_count_mismatch(self, runner, toy_assembly):
        result = runner.invoke(
            stats.main, [str(toy_assembly["fasta"]), "-l", "a,b"]
        )
        assert result.exit_code != 0


class TestPolishCli:
    def _info(self, tmp_path):
        from instagraal_tpu.polish import write_info_frags

        info = tmp_path / "info_frags.txt"
        write_info_frags(
            {
                "3C-assembly|contig_1": [
                    ["c1", 0, 0, 40, 1],
                    ["c1", 1, 40, 80, -1],
                ]
            },
            info,
        )
        return info

    def _fasta(self, tmp_path):
        from instagraal_tpu.io.fasta import write_fasta

        fasta = tmp_path / "ref.fa"
        write_fasta({"c1": "ACGT" * 30}, fasta)
        return fasta

    def test_polishing_mode(self, runner, tmp_path):
        info = self._info(tmp_path)
        fasta = self._fasta(tmp_path)
        out = tmp_path / "out"
        result = runner.invoke(
            polish.main,
            ["-i", str(info), "-f", str(fasta), "-o", str(out)],
        )
        assert result.exit_code == 0, result.output
        assert (out / "new_info_frags.txt").exists()
        assert (out / "polished_genome.fa").exists()

    def test_mode_requires_fasta(self, runner, tmp_path):
        info = self._info(tmp_path)
        result = runner.invoke(
            polish.main, ["-i", str(info), "-o", str(tmp_path / "o")]
        )
        assert result.exit_code != 0

    @pytest.mark.parametrize(
        "mode", ["singleton", "inversion", "inversion2", "rearrange"]
    )
    def test_info_only_modes(self, runner, tmp_path, mode):
        info = self._info(tmp_path)
        out = tmp_path / f"out_{mode}"
        result = runner.invoke(
            polish.main, ["-i", str(info), "-o", str(out), "-m", mode]
        )
        assert result.exit_code == 0, result.output
        assert (out / "new_info_frags.txt").exists()


class TestEndToEndCli:
    def test_dry_run(self, runner, toy_assembly, tmp_path):
        result = runner.invoke(
            endtoend.main,
            [
                str(toy_assembly["fasta"]),
                str(toy_assembly["pairs"]),
                "-o",
                str(tmp_path / "e2e"),
                "--dry-run",
                "-l",
                "2",
                "-n",
                "2",
            ],
        )
        assert result.exit_code == 0, result.output
        for step in ("pre", "scaffold", "polish", "post", "stats"):
            assert f"[{step}]" in result.output

    def test_option_forwarding(self, runner, toy_assembly, tmp_path):
        result = runner.invoke(
            endtoend.main,
            [
                str(toy_assembly["fasta"]),
                str(toy_assembly["pairs"]),
                "-o",
                str(tmp_path / "e2e"),
                "--dry-run",
                "-l",
                "3",
                "-n",
                "7",
                "-N",
                "4",
                "--bomb",
                "--circular",
                "-e",
                "DpnII,HinfI",
                "--chains",
                "4",
                "--shard-nnz",
            ],
        )
        assert result.exit_code == 0
        assert "-l 3" in result.output
        assert "-n 7" in result.output
        # multi-chip flags reach the scaffold subprocess
        assert "--chains 4" in result.output
        assert "--shard-nnz" in result.output
        assert "-N 4" in result.output
        assert "--bomb" in result.output
        assert "--circular" in result.output
        assert "DpnII,HinfI" in result.output

    def test_step_failure_propagates(self, runner, toy_assembly, tmp_path):
        with mock.patch(
            "instagraal_tpu.cli.endtoend.subprocess.run"
        ) as run_mock:
            run_mock.return_value = mock.Mock(returncode=3)
            result = runner.invoke(
                endtoend.main,
                [
                    str(toy_assembly["fasta"]),
                    str(toy_assembly["pairs"]),
                    "-o",
                    str(tmp_path / "e2e"),
                ],
            )
        assert result.exit_code == 3


class TestScaffolderCli:
    def test_pyramid_only(self, runner, toy_pre, tmp_path):
        result = runner.invoke(
            main_cli.main,
            [
                str(toy_pre["dir"]),
                str(toy_pre["fasta"]),
                "-o",
                str(tmp_path / "pyr"),
                "--pyramid-only",
            ],
        )
        assert result.exit_code == 0, result.output
        assert (tmp_path / "pyr" / "pyramids").exists()


class TestInstagraalTestCli:
    """instagraal-test: Zenodo attempt-then-fallback (reference
    cli/test.py:21-23; VERDICT r4 #9)."""

    def test_fallback_on_unreachable_zenodo(self, tmp_path, monkeypatch):
        """When the Zenodo fetch fails, the command says so and falls
        back to the synthetic dataset (no network in CI)."""
        import urllib.error

        from instagraal_tpu.cli import test as test_cli

        calls = []

        def fake_urlopen(url, timeout=None):
            calls.append(url)
            raise urllib.error.URLError("no network")

        monkeypatch.setattr(
            test_cli.urllib.request, "urlopen", fake_urlopen
        )
        got = test_cli.fetch_zenodo_dataset(tmp_path)
        assert got is None
        assert calls and test_cli.ZENODO_RECORD_ID in calls[0]
        # no partial files left behind
        assert not any(tmp_path.iterdir())

    def test_fetch_uses_cached_files(self, tmp_path, monkeypatch):
        """Existing downloads are reused without touching the net."""
        from instagraal_tpu.cli import test as test_cli

        (tmp_path / test_cli.TEST_FASTA).write_bytes(b"x")
        (tmp_path / test_cli.TEST_PAIRS).write_bytes(b"y")

        def boom(url, timeout=None):  # pragma: no cover
            raise AssertionError("network touched despite cache")

        monkeypatch.setattr(
            test_cli.urllib.request, "urlopen", boom
        )
        fasta, pairs = test_cli.fetch_zenodo_dataset(tmp_path)
        assert fasta.name == test_cli.TEST_FASTA
        assert pairs.name == test_cli.TEST_PAIRS

    def test_offline_flag_skips_download(self, monkeypatch, tmp_path):
        """--offline + --help style smoke: the option exists and the
        command wires it (full runs live in the endtoend tests)."""
        from click.testing import CliRunner

        from instagraal_tpu.cli import test as test_cli

        r = CliRunner().invoke(test_cli.main, ["--help"])
        assert r.exit_code == 0
        assert "--offline" in r.output
        assert "Zenodo" in r.output or "zenodo" in r.output
