"""CLI flag-surface regression tests (scmgan_tpu/cli/main.py).

The flag surface is the reference's 20-flag argparse interface
(reference main.py:25-51) plus the TPU extras; these tests pin that the
parser itself stays healthy — argparse help-string formatting is easy to
break silently (a bare '%' in a help= crashes --help at print time, not
at definition time).
"""

import pytest

from scmgan_tpu.cli.main import build_parser


def test_help_text_formats():
    # format_help() interpolates every help string; a stray unescaped
    # '%' raises ValueError here (regression: --student's "within 1%").
    text = build_parser().format_help()
    assert "--env" in text
    assert "--student" in text
    assert "--latent-overshooting" in text


def test_reference_flag_surface_parses():
    # The reference's documented invocation shapes must parse.
    p = build_parser()
    a = p.parse_args(["--env", "pong", "--train-iters", "100",
                      "--batch-size", "8", "--truncate-bptt",
                      "--latent-overshooting", "--td-lambda", "0.8",
                      "--horizon-min", "3", "--horizon-max", "10",
                      "--enable-action-control-loss",
                      "--enable-disentanglement-loss"])
    assert a.env == "pong" and a.train_iters == 100
    a = p.parse_args(["--env", "minipacman", "--evaluate",
                      "--evaluations", "10", "--load-from", "/tmp/x",
                      "--student", "/tmp/s"])
    assert a.evaluate and a.evaluations == 10 and a.student == "/tmp/s"


def test_env_is_required():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--evaluate"])
