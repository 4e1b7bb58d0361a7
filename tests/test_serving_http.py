"""The ADS HTTP service end-to-end: live server, reference routes/payloads
(pub/controller/TradeStatController.java:28-79)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from pyspark.sql import functions as F

from realtime_datawarehouse_spark import serving, serving_http
from realtime_datawarehouse_spark.tables import table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def ads_server(spark):
    server = serving_http.make_server(spark, SF_DIR)
    serving_http.start_background(server)
    host, port = server.server_address
    yield f"http://{host}:{port}"
    server.shutdown()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read().decode("utf-8"))


def test_http_gmv_matches_direct_call(spark, ads_server):
    date = (
        table(spark, SF_DIR, "orders")
        .select(F.date_format("o_orderdate", "yyyyMMdd").alias("d"))
        .groupBy("d").count().orderBy(F.desc("count")).first().d
    )
    status, payload = _get(f"{ads_server}/gmv?date={date}")
    assert status == 200
    direct = serving.gmv(spark, SF_DIR, date)
    assert payload == {"status": 0, "data": direct["data"]}
    assert payload["data"] > 0


def test_http_province_payload_shape(spark, ads_server):
    date = (
        table(spark, SF_DIR, "orders")
        .select(F.date_format("o_orderdate", "yyyyMMdd").alias("d"))
        .first().d
    )
    status, payload = _get(f"{ads_server}/province?date={date}")
    assert status == 200
    assert payload["status"] == 0
    assert payload["data"]["valueName"] == serving.VALUE_NAME
    assert all(set(e) == {"name", "value"} for e in payload["data"]["mapData"])


def test_http_unknown_route_404(ads_server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{ads_server}/nope")
    assert ei.value.code == 404
