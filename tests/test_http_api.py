"""HTTP façade integration tests — the reference's actual entry point
(``POST /algorithm`` over gin, server/views.go:83-160): the demo word count
submitted over real HTTP matches the in-process algorithm result; request
validation returns 400; cancel and sink modes work end-to-end."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pytest

from go_web_mapreduce_spark.http_api import serve_background
from go_web_mapreduce_spark.service import AlgorithmCancelled, AlgorithmService

WORDS = (
    "pastrami beef ribs bacon tri-tip fatback turkey ham biltong pork "
    "t-bone brisket tail kevin boudin pork loin ham hock ground round "
    "flank frankfurter sausage shankle flank pig pancetta brisket "
    "porchetta beef bacon pork chop shankle fatback landjaeger biltong "
    "tenderloin"
).split()  # the reference's baked-in demo input (server/views.go:43)


@pytest.fixture(scope="module")
def server(spark):
    srv = serve_background(spark, port=0)
    yield srv
    srv.shutdown()


def _url(server, path):
    host, port = server.server_address
    return f"http://{host}:{port}{path}"


def _post(server, path, payload):
    req = urllib.request.Request(
        _url(server, path),
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(server, path):
    try:
        with urllib.request.urlopen(_url(server, path), timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _poll_result(server, algorithm_id, timeout=120):
    deadline = time.time() + timeout
    while time.time() < deadline:
        status, body = _get(server, f"/result/{algorithm_id}")
        if status != 202:
            return status, body
        time.sleep(0.2)
    raise TimeoutError(f"algorithm {algorithm_id} did not finish")


def _demo_request(**over):
    req = {
        "map_input_length": 10,
        # the reference's demo word count (server/views.go:51-61) in the
        # python dialect
        "map_code": "lambda k, v: (len(v) % 2, v, '1')",
        "reduce_code": "lambda k, vs: str(len(vs))",
        "input": [["", w] for w in WORDS],
    }
    req.update(over)
    return req


def _expected_counts():
    out = {}
    for w in WORDS:
        out[w] = out.get(w, 0) + 1
    return {k: str(v) for k, v in out.items()}


def test_demo_wordcount_over_http(server):
    status, body = _post(server, "/algorithm", _demo_request())
    assert status == 200, body
    assert body["num_map_jobs"] == 4  # ceil(39/10)
    assert body["num_partitions"] == 1  # max(1, 4//10)
    status, body = _poll_result(server, body["algorithm_id"])
    assert status == 200 and body["status"] == "done"
    got = {r["key"]: r["value"] for r in body["results"]}
    assert got == _expected_counts()


def test_sql_dialect_matches_python_dialect(server):
    status, body = _post(
        server,
        "/algorithm",
        _demo_request(
            dialect="sql",
            map_code={"pi": "length(value) % 2", "key": "value", "value": "'1'"},
            reduce_code="cast(size(values) as string)",
        ),
    )
    assert status == 200, body
    status, body = _poll_result(server, body["algorithm_id"])
    assert status == 200, body
    got = {r["key"]: r["value"] for r in body["results"]}
    assert got == _expected_counts()


def test_validation_to_400(server):
    # missing required fields (govalidator semantics, server/views.go:93-104)
    for broken in (
        {k: v for k, v in _demo_request().items() if k != "map_code"},
        {k: v for k, v in _demo_request().items() if k != "input"},
        _demo_request(map_input_length=0),
        _demo_request(input=[]),
        _demo_request(map_code="not python ((("),
        _demo_request(dialect="haskell"),
    ):
        status, body = _post(server, "/algorithm", broken)
        assert status == 400, (broken, body)
        assert "error" in body
    # malformed JSON body (BindJSON → 400, server/views.go:85-90)
    req = urllib.request.Request(
        _url(server, "/algorithm"), data=b"{not json", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


def test_unknown_routes_and_ids(server):
    status, _ = _get(server, "/result/no-such-id")
    assert status == 404
    status, _ = _get(server, "/nope")
    assert status == 404
    status, body = _get(server, "/algorithm")
    assert status == 200 and "running" in body


def test_sink_path_over_http(server, spark, tmp_path):
    sink = str(tmp_path / "http_results")
    status, body = _post(server, "/algorithm", _demo_request(sink_path=sink))
    assert status == 200, body
    status, body = _poll_result(server, body["algorithm_id"])
    assert status == 200 and body["sink_path"] == sink
    got = {r["key"]: r["value"] for r in spark.read.parquet(sink).collect()}
    assert got == _expected_counts()


def test_service_sink_mode(spark, tmp_path):
    service = AlgorithmService(spark)
    sink = str(tmp_path / "svc_results")
    h = service.submit(
        lambda k, v: (len(v) % 2, v, "1"),
        lambda k, vs: str(len(vs)),
        [("", w) for w in WORDS],
        10,
        sink_path=sink,
    )
    assert h.wait(timeout=120) == sink
    got = {r["key"]: r["value"] for r in spark.read.parquet(sink).collect()}
    assert got == _expected_counts()


def test_service_cancel(spark):
    service = AlgorithmService(spark)

    def slow_map(k, v):
        time.sleep(0.4)  # ~39 rows × 0.4s across 4 tasks — cancellable window
        return (0, v, "1")

    h = service.submit(slow_map, lambda k, vs: str(len(vs)),
                       [("", w) for w in WORDS], 10)
    assert h.algorithm_id in service.running()
    assert service.cancel(h.algorithm_id)
    with pytest.raises(AlgorithmCancelled):
        h.wait(timeout=120)
    assert h.algorithm_id not in service.running()  # pool GC'd
    # cancelling an unknown or finished id is a no-op
    assert not service.cancel("no-such-id")
    assert not service.cancel(h.algorithm_id)


def test_cancel_over_http(server):
    status, body = _post(
        server,
        "/algorithm",
        _demo_request(
            map_code="lambda k, v: (__import__('time').sleep(0.4), v, '1')[1:] "
            "and (0, v, '1')",
        ),
    )
    assert status == 200, body
    aid = body["algorithm_id"]
    status, body = urllib_delete(server, f"/algorithm/{aid}")
    if status == 404:
        # the algorithm may already have completed on a fast host — then the
        # result must be available instead
        status, body = _poll_result(server, aid)
        assert status == 200
        return
    assert status == 200
    status, body = _poll_result(server, aid)
    assert status == 410 and body["status"] == "cancelled"


def urllib_delete(server, path):
    req = urllib.request.Request(_url(server, path), method="DELETE")
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())
