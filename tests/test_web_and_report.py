"""Pluggable web-validation stage (fake transport) and the report sink."""

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_web_validate_with_injected_transport():
    import ray.data

    from pdf2doi_ray.stages.web import attach_web_validation

    calls = {}

    def fake_fetch(url):
        calls[url] = calls.get(url, 0) + 1
        if url.endswith("10.1/bad"):
            return 404, ""
        if url.endswith("10.1/flaky") and calls[url] < 3:
            return 503, ""             # retried
        return 200, "@article{x}"

    ids = ray.data.from_arrow(pa.table({
        "identifier": ["10.1/good", "10.1/bad", "10.1/flaky", None],
        "validation_info": ["True", "True", "True", None],
    }))
    out = attach_web_validation(ids, fake_fetch, concurrency=1) \
        .to_pandas().set_index("identifier", drop=False)
    assert out.loc["10.1/good", "validation_info"] == "@article{x}"
    assert out.loc["10.1/flaky", "validation_info"] == "@article{x}"
    assert out.loc["10.1/bad", "validation_info"] is None


def test_web_validate_refuses_silent_network():
    from pdf2doi_ray.stages.web import WebValidate

    with pytest.raises(NotImplementedError, match="no network"):
        WebValidate()


@pytest.mark.usefixtures("ray_session")
def test_report_sink_fixed_width(tmp_path):
    import ray.data

    from pdf2doi_ray.pipelines.identify import write_report

    ids = ray.data.from_arrow(pa.table({
        "url": ["u1", "u2"],
        "identifier": ["10.1/x", None],
        "identifier_type": ["DOI", None],
        "method": ["document_text", None],
        "validation_info": ["True", None],
    }))
    path = tmp_path / "dois.txt"
    n = write_report(ids, str(path))
    lines = path.read_text().splitlines()
    assert n == 2
    # byte-level parity with the reference's '{:<15s} {:<40s} {:<10s}' rows
    assert lines[0] == "{:<15s} {:<40s} {:<10s}".format("DOI", "10.1/x", "u1")
    assert lines[1].startswith("n.a.            n.a.")
