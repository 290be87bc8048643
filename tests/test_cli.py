"""CLI driver parity: each reference workload entry point
(make join_v1 / join_v2, nested-loop, selection — reference makefile:9-14)
has a subcommand with the reference @main's observable contract: timing
lines, result count, success flag."""
import numpy as np
import pytest

from tpujoin import cli


def run(capsys, argv):
    rc = cli.main(argv)
    return rc, capsys.readouterr().out


@pytest.mark.parametrize("variant", ["join_v1", "join_v2"])
def test_join_workloads(capsys, variant):
    rc, out = run(capsys, [
        variant, "--build-rows", "2000", "--probe-rows", "2000",
        "--key-max", "500", "--verify"])
    assert rc == 0
    assert "result rows:" in out
    assert "success: 1" in out
    assert "[build]" in out and "[count]" in out and "[probe]" in out


def test_selection_workload(capsys):
    rc, out = run(capsys, ["selection", "--rows", "4096", "--verify"])
    assert rc == 0
    assert "success: 1" in out


def test_nested_loop_workload(capsys):
    rc, out = run(capsys, [
        "nested_loop", "--build-rows", "300", "--probe-rows", "200",
        "--key-max", "50", "--verify"])
    assert rc == 0
    assert "success: 1" in out


def test_aggregate_workload(capsys):
    rc, out = run(capsys, ["aggregate", "--rows", "4096", "--key-max", "100",
                           "--verify"])
    assert rc == 0
    assert "groups:" in out and "success: 1" in out


def test_distributed_workload(capsys):
    rc, out = run(capsys, [
        "distributed", "--build-rows", "2048", "--probe-rows", "2048",
        "--key-max", "300", "--devices", "8", "--verify"])
    assert rc == 0
    assert "devices: 8" in out and "success: 1" in out


def test_zipf_distribution_flag(capsys):
    rc, out = run(capsys, [
        "join_v1", "--build-rows", "2000", "--probe-rows", "2000",
        "--key-max", "1000", "--distribution", "zipf", "--verify"])
    assert rc == 0
    assert "success: 1" in out


@pytest.mark.parametrize("how,variant", [("semi", "join_v1"),
                                         ("left", "join_v2"),
                                         ("anti", "join_v1")])
def test_join_how_variants(capsys, how, variant):
    rc, out = run(capsys, [
        variant, "--build-rows", "1000", "--probe-rows", "1500",
        "--key-max", "200", "--how", how])
    assert rc == 0
    assert "result rows:" in out


def test_join_v2_engine_verifies(capsys):
    rc, out = run(capsys, [
        "join_v2", "--build-rows", "3000", "--probe-rows", "3000",
        "--key-max", "400", "--verify"])
    assert rc == 0
    assert "success: 1" in out
