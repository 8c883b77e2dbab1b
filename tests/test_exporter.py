"""Prometheus exporter (exporter.py + jobs/server.py --metrics-port):
text exposition rendering, counter accumulation across passes,
instance lifecycle, and the live HTTP /metrics endpoint — the
reference prometheus module analogue (PrometheusService.java:43-57,
CanalInstanceExports.java:19, InstanceRegistry.java)."""

import urllib.request

import pytest

from canal_spark.exporter import (MetricsRegistry, render_exposition,
                                  start_exporter)


def test_render_exposition_groups_families_with_type_headers():
    text = render_exposition({
        'canal_instance_put_rows{destination="a"}': 10,
        'canal_instance_put_rows{destination="b"}': 3,
        'canal_spark_merge_files_rewritten{destination="a"}': 2.0,
        "canal_spark_server_rounds_total": 7,
    })
    lines = text.splitlines()
    # one HELP+TYPE per family, counters vs gauges by suffix
    assert "# TYPE canal_instance_put_rows counter" in lines
    assert "# TYPE canal_spark_merge_files_rewritten gauge" in lines
    assert "# TYPE canal_spark_server_rounds_total counter" in lines
    assert lines.count("# TYPE canal_instance_put_rows counter") == 1
    # samples render under their family, labels intact, ints unsuffixed
    assert 'canal_instance_put_rows{destination="a"} 10' in lines
    assert 'canal_instance_put_rows{destination="b"} 3' in lines
    assert "canal_spark_server_rounds_total 7" in lines
    # family header precedes its samples
    assert lines.index("# TYPE canal_instance_put_rows counter") < lines.index(
        'canal_instance_put_rows{destination="a"} 10'
    )
    assert text.endswith("\n")


def test_render_exposition_rejects_malformed_keys():
    with pytest.raises(ValueError, match="sample key"):
        render_exposition({"not a metric name!": 1})


def test_registry_counters_accumulate_gauges_replace():
    reg = MetricsRegistry()
    lbl = '{destination="d1"}'
    reg.update_instance("d1", {
        f"canal_instance_put_rows{lbl}": 100,
        f"canal_spark_merge_files_rewritten{lbl}": 5,
    })
    reg.update_instance("d1", {
        f"canal_instance_put_rows{lbl}": 40,
        f"canal_spark_merge_files_rewritten{lbl}": 2,
    })
    text = reg.render()
    # counter family: lifetime total across both passes
    assert f"canal_instance_put_rows{lbl} 140" in text
    # gauge family: latest pass wins
    assert f"canal_spark_merge_files_rewritten{lbl} 2" in text


def test_registry_remove_instance_unregisters_all_families():
    reg = MetricsRegistry()
    reg.update_instance("d1", {'canal_instance_put_rows{destination="d1"}': 1})
    reg.update_instance("d2", {'canal_instance_put_rows{destination="d2"}': 2})
    reg.update_server({"canal_spark_server_rounds_total": 3})
    reg.remove_instance("d1")
    text = reg.render()
    assert 'destination="d1"' not in text
    assert 'canal_instance_put_rows{destination="d2"} 2' in text
    assert "canal_spark_server_rounds_total 3" in text


def test_http_endpoint_serves_metrics_and_404s_elsewhere():
    reg = MetricsRegistry()
    reg.update_server({"canal_spark_server_instances": 4})
    server = start_exporter(reg, port=0)  # ephemeral port
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/plain; version=0.0.4")
            body = r.read().decode()
        assert "canal_spark_server_instances 4" in body
        # a later pass is visible on the next scrape (latest-value store)
        reg.update_instance("d9", {'canal_instance_put_rows{destination="d9"}': 8})
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            assert 'canal_instance_put_rows{destination="d9"} 8' in r.read().decode()
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/other")
        assert ei.value.code == 404
    finally:
        server.shutdown()
        server.server_close()


def test_pass_metrics_round_trip_through_registry(spark, tmp_path):
    """End-to-end shape check: run_instance_pass metrics feed the
    registry and render as scrapeable exposition with the destination
    label."""
    from tests.test_instance import _mk_dest, _write_spec

    conf = tmp_path / "conf"
    doc, _, _ = _mk_dest(spark, tmp_path, "expd", n=200, n_changes=60)
    _write_spec(conf, "expd", **doc)
    from canal_spark.instance import run_server_round, scan_instances

    specs, errors = scan_instances(str(conf))
    assert not errors
    results = run_server_round(spark, specs)
    reg = MetricsRegistry()
    reg.update_instance("expd", results["expd"]["metrics"])
    text = reg.render()
    assert 'canal_instance_put_rows{destination="expd"}' in text
    assert 'canal_instance_transactions{destination="expd"} 1' in text
    assert "# TYPE canal_instance_put_rows counter" in text
