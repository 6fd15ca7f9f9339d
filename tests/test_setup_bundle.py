"""Setup-bundle generator (governance/setup_bundle.py — ref
contracts-app setup_bundle/pipeline_stub.py): rendered scaffolds are
verified BY EXECUTION — every generated pipeline runs in-process against
its own config.toml and must print a green governed verdict."""

import runpy

import pytest

from dc43_spark.governance.setup_bundle import (
    BundleConfig,
    render_setup_bundle,
    write_setup_bundle,
)


def _run_bundle(monkeypatch, dest):
    monkeypatch.chdir(dest)
    entry = (
        dest / "pipeline.py"
        if (dest / "pipeline.py").exists()
        else dest / "dlt_pipeline.py"
    )
    mod = runpy.run_path(str(entry), run_name="bundle_under_test")
    return mod["main"]()


@pytest.mark.parametrize(
    "fmt,cstore,gstore",
    [
        ("parquet", "filesystem", "filesystem"),
        ("snaplog", "memory", "sql"),
        ("delta", "sql", "memory"),
    ],
)
def test_spark_bundle_executes_green(
    spark, tmp_path, monkeypatch, fmt, cstore, gstore
):
    cfg = BundleConfig(
        project=f"demo-{fmt}",
        table_format=fmt,
        contract_store=cstore,
        governance_store=gstore,
        rows=60,
    )
    dest = tmp_path / fmt
    paths = write_setup_bundle(cfg, str(dest))
    assert {p.rsplit("/", 1)[1] for p in paths} == {
        "config.toml", "pipeline.py", "README.md",
    }
    status = _run_bundle(monkeypatch, dest)
    assert status == "ok"
    # second run is idempotent (overwrite mode, store already seeded)
    assert _run_bundle(monkeypatch, dest) == "ok"
    # the verdict PERSISTED to the configured governance store (the
    # bundle's store selection has a runtime effect, not just a print)
    if gstore != "memory":
        from dc43_spark.governance.bootstrap import (
            build_governance_store,
            load_config,
        )

        g = build_governance_store(
            load_config(str(dest / "config.toml")).governance_store,
            spark=spark,
        )
        # the dataset target anchors to the BUNDLE directory (Spark's
        # JVM resolves relative paths against its own cwd, so a relative
        # target would land wherever the JVM started — r12 fix)
        matrix = g.status_matrix(str(dest / "data" / cfg.contract_id))
        assert matrix and matrix[-1]["status"] == "ok"


def test_dlt_bundle_executes_green(spark, tmp_path, monkeypatch):
    cfg = BundleConfig(integration="dlt", rows=40)
    dest = tmp_path / "dlt"
    write_setup_bundle(cfg, str(dest))
    reports = _run_bundle(monkeypatch, dest)
    assert set(reports) == {"orders", "paid_orders"}
    assert all(r.ok for r in reports.values())
    assert reports["orders"].rows_out == 40


def test_render_is_pure_and_refuses_overwrite(tmp_path):
    cfg = BundleConfig()
    a, b = render_setup_bundle(cfg), render_setup_bundle(cfg)
    assert a == b  # pure function of the config
    assert "build_contract_store" in a["pipeline.py"]
    assert '[contract_store]\ntype = "filesystem"' in a["config.toml"]
    write_setup_bundle(cfg, str(tmp_path / "b"))
    with pytest.raises(FileExistsError, match="already exist"):
        write_setup_bundle(cfg, str(tmp_path / "b"))


def test_validation_matrix():
    with pytest.raises(ValueError, match="integration"):
        BundleConfig(integration="flink").validate()
    with pytest.raises(ValueError, match="table_format"):
        BundleConfig(table_format="iceberg").validate()
    with pytest.raises(ValueError, match="contract_store"):
        BundleConfig(contract_store="collibra").validate()


def test_setup_export_route_zip_executes(spark, tmp_path, monkeypatch):
    """/setup/export (r14 — VERDICT r13 #7, ref contracts-app
    /setup/export StreamingResponse): the running app streams the setup
    bundle as a ZIP; unzipped, the bundle EXECUTES green exactly like a
    write_setup_bundle one (same renderer, same roots). Bad selections
    400 loudly; same selections produce byte-identical archives."""
    import io
    import urllib.error
    import urllib.request
    import zipfile

    from dc43_spark.governance.server import GovernanceServiceServer

    def fetch(url, path):
        with urllib.request.urlopen(url + path, timeout=10) as resp:
            return resp.headers, resp.read()

    with GovernanceServiceServer() as url:
        headers, data = fetch(
            url, "/setup/export?project=zipdemo&format=snaplog&rows=40"
        )
        assert headers["Content-Type"] == "application/zip"
        assert 'filename="dc43-setup-zipdemo-' in headers["Content-Disposition"]
        # deterministic: same selections, byte-identical archive
        _h2, data2 = fetch(
            url, "/setup/export?project=zipdemo&format=snaplog&rows=40"
        )
        assert data2 == data

        with pytest.raises(urllib.error.HTTPError) as exc:
            fetch(url, "/setup/export?format=orc")
        assert exc.value.code == 400

    dest = tmp_path / "unzipped"
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        names = set(z.namelist())
        assert {"config.toml", "pipeline.py", "README.md"} <= names
        assert "data/" in names  # empty roots ride as dir entries
        z.extractall(dest)
    assert _run_bundle(monkeypatch, dest) == "ok"
