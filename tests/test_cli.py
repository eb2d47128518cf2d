"""CLI end-to-end: gen → extract → eval inside the shared session
(the CLI must not tear down a Ray session it didn't start)."""

import json

import ray

from arabic_ocr_ray.cli import main


def test_cli_gen_extract_eval(ray_session, default_model, tmp_path, capsys):
    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")

    assert main(["gen", "-o", pages, "-n", "40", "--seed", "77"]) == 0
    assert ray.is_initialized()  # session survived

    assert main(["extract", "-i", pages, "-o", out]) == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["docs"] == 40

    assert main(["eval", "-i", pages, "-e", out]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["match_rate"] == 1.0
    assert ray.is_initialized()
