"""Commit-arbiter CONTRACT suite, parametrized over both backends
(VERDICT r7 item 3): every scenario runs against the POSIX
``LocalCASArbiter`` AND the object-store ``ObjectStoreCASArbiter``
(over the in-process ``InMemoryObjectStore`` honoring S3
``If-None-Match: *`` precondition-failed semantics), proving the
backends interchangeable behind ``set_arbiter`` — INTEGRATIONS.md §4's
"byte-level protocol compat" paragraph as a tested claim."""
from __future__ import annotations

import threading

import pytest

from realtime_datawarehouse_spark.operators import object_store, table_store


class _FakeServiceError(Exception):
    """Duck-typed botocore ClientError: carries the
    ``response['Error']['Code']`` shape S3ObjectStore consumes (botocore
    itself is not importable in this image)."""

    def __init__(self, code, op):
        super().__init__(f"{code} on {op}")
        self.response = {"Error": {"Code": code}}


class _FakeBoto3Client:
    """Duck-typed boto3 S3 client over InMemoryObjectStore — the exact
    call/response/error shapes the S3ObjectStore adapter consumes
    (put_object + IfNoneMatch='*' → 412 PreconditionFailed, get_object →
    NoSuchKey, list_objects_v2 paginator paged at 2 keys, idempotent
    delete_object), so the adapter's per-call mapping runs through the
    FULL contract suite without boto3/network."""

    def __init__(self, store):
        self._s = store

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        assert IfNoneMatch == "*", "arbiter PUTs must be conditional"
        if not self._s.put_if_none_match(Key, Body):
            raise _FakeServiceError("PreconditionFailed", "put_object")
        return {}

    def get_object(self, Bucket, Key):
        try:
            data = self._s.get(Key)
        except KeyError:
            raise _FakeServiceError("NoSuchKey", "get_object") from None

        class _Body:
            def read(self, _d=data):
                return _d

        return {"Body": _Body()}

    def get_paginator(self, op):
        assert op == "list_objects_v2"
        store = self._s

        class _Paginator:
            def paginate(self, Bucket, Prefix):
                keys = store.list(Prefix)
                if not keys:
                    yield {}
                for i in range(0, len(keys), 2):
                    yield {"Contents": [{"Key": k} for k in keys[i:i + 2]]}

        return _Paginator()

    def delete_object(self, Bucket, Key):
        self._s.delete(Key)
        return {}


@pytest.fixture(
    params=["local", "object", "object-faulted", "s3-adapter", "s3-moto"]
)
def backend(request):
    """(name, arbiter, plant_foreign) — plant_foreign(path, name, body)
    writes a foreign-named commit entry the way an external tool would
    (direct file / direct bucket write).

    ``object-faulted`` (VERDICT r8 item 4) runs the IDENTICAL scenarios
    against a store that pages its listings at 2 keys and throws a 503
    on every 3rd invocation of each method, absorbed by the documented
    retry client — every contract property must survive the fault
    model, not just the happy path.

    ``s3-moto`` (round 11 — boto3 1.43 + moto 5.2 appeared in the
    image, INTEGRATIONS §4 activation): the IDENTICAL scenarios through
    the REAL boto3/botocore stack — genuine request serialization,
    param validation, ClientError shapes, and paginator — against
    moto's in-process S3, which honors `IfNoneMatch: '*'` →
    PreconditionFailed conditional-write semantics (verified before
    wiring). The adapter is built exactly as documented: standard-retry
    client for get/list/delete, `total_max_attempts: 1` put client."""
    if request.param == "local":
        arb = table_store.LocalCASArbiter()

        def plant(path, name, body):
            import os

            os.makedirs(arb._dir(path), exist_ok=True)
            with open(
                os.path.join(arb._dir(path), name), "w", encoding="utf-8"
            ) as f:
                f.write(body)

        yield request.param, arb, plant
        return
    if request.param == "object":
        store = object_store.InMemoryObjectStore()
        plant_store = store
        ctx = None
    elif request.param == "object-faulted":
        store = object_store.RetryingStoreClient(
            object_store.FaultInjectingObjectStore(
                object_store.InMemoryObjectStore(page_size=2),
                throttle_every=3,
            )
        )
        plant_store = store
        ctx = None
    elif request.param == "s3-moto":
        boto3 = pytest.importorskip("boto3")
        moto = pytest.importorskip("moto")
        from botocore.config import Config

        ctx = moto.mock_aws()
        ctx.start()
        kw = dict(
            region_name="us-east-1",
            aws_access_key_id="test",
            aws_secret_access_key="test",
        )
        client = boto3.client(
            "s3", config=Config(retries={"mode": "standard"}), **kw
        )
        put_client = boto3.client(
            "s3", config=Config(retries={"total_max_attempts": 1}), **kw
        )

        # moto's IfNoneMatch handling is check-then-set Python with no
        # internal lock, so two racing threads can BOTH win a conditional
        # PUT (observed r14: wins=[6,1] in the 8-thread CAS race — a moto
        # emulation gap, not an arbiter bug; real S3 serializes
        # conditional PUTs server-side and returns 412 to all but one).
        # Serialize the emulator's conditional PUTs so the contract suite
        # tests OUR client-side mapping against moto's response shapes
        # without depending on moto's (absent) thread-safety.
        class _SerializedPuts:
            def __init__(self, inner):
                self._inner = inner
                self._lock = threading.Lock()

            def put_object(self, **kwargs):
                with self._lock:
                    return self._inner.put_object(**kwargs)

            def __getattr__(self, name):
                return getattr(self._inner, name)

        put_client = _SerializedPuts(put_client)
        client.create_bucket(Bucket="contract-bucket")
        plant_store = object_store.S3ObjectStore(
            bucket="contract-bucket", client=client, put_client=put_client
        )
        store = object_store.RetryingStoreClient(plant_store)
    else:  # s3-adapter: the boto3 mapping over a duck-typed fake client
        inner = object_store.InMemoryObjectStore()
        store = object_store.RetryingStoreClient(
            object_store.S3ObjectStore(
                bucket="contract-bucket", client=_FakeBoto3Client(inner)
            )
        )
        plant_store = inner
        ctx = None
    arb = object_store.ObjectStoreCASArbiter(store)
    try:
        yield (
            request.param,
            arb,
            lambda path, name, body: plant_store.force_put(
                arb._dir(path) + name, body.encode()
            ),
        )
    finally:
        if ctx is not None:
            ctx.stop()


@pytest.fixture()
def swapped(backend):
    """Route table_store.commit() through the parametrized backend."""
    _name, arb, _plant = backend
    prev = table_store._ARBITER
    table_store.set_arbiter(arb)
    try:
        yield arb
    finally:
        table_store.set_arbiter(prev)


def test_cas_single_winner_per_sequence(backend, tmp_path):
    """Of 8 threads racing one sequence, exactly one conditional PUT
    succeeds, the committed content is the winner's, every loser sees
    False — on BOTH backends."""
    _name, arb, _plant = backend
    path = str(tmp_path)
    for seq in range(1, 4):
        wins: list[int] = []
        barrier = threading.Barrier(8)

        def racer(i, seq=seq):
            barrier.wait()
            if arb.put_if_absent(path, seq, f"v-{i:010d}"):
                wins.append(i)

        threads = [
            threading.Thread(target=racer, args=(i,)) for i in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(wins) == 1, wins
        assert arb.committed(path)[seq] == f"v-{wins[0]:010d}"
    assert sorted(arb.committed(path)) == [1, 2, 3]
    assert arb.head(path)[0] == 3


def test_head_tolerates_foreign_names(backend, tmp_path):
    """A foreign non-padded decimal entry is SERVED (it is a commit,
    whoever spelled it); a non-decimal or unicode-digit name is ignored;
    prune drops foreign spellings by their listed name once outside the
    retention window — the ADVICE r7 semantics, identical on both
    backends."""
    _name, arb, plant = backend
    path = str(tmp_path)
    assert arb.put_if_absent(path, 1, "v-a")
    plant(path, "7", "v-foreign")
    plant(path, "²", "v-bogus")
    plant(path, "not-a-seq", "v-bogus")
    assert arb.head(path) == (7, "v-foreign")
    assert arb.committed(path) == {1: "v-a", 7: "v-foreign"}
    for s in range(8, 12):
        assert arb.put_if_absent(path, s, f"v-{s:010d}")
    arb.prune(path, keep_newest=2)
    assert sorted(arb.committed(path)) == [10, 11]


def test_prune_keeps_duplicate_spellings_of_kept_sequences(
    backend, tmp_path
):
    _name, arb, plant = backend
    path = str(tmp_path)
    for s in range(1, 6):
        assert arb.put_if_absent(path, s, f"v-{s:010d}")
    plant(path, "5", "v-dup-of-5")
    arb.prune(path, keep_newest=2)
    committed = arb.committed(path)
    assert sorted(committed) == [4, 5]


def test_put_if_absent_loses_to_prior_put(backend, tmp_path):
    """The precondition-failed path: a taken sequence returns False and
    never overwrites — the 412 contract itself."""
    _name, arb, _plant = backend
    path = str(tmp_path)
    assert arb.put_if_absent(path, 1, "v-first") is True
    assert arb.put_if_absent(path, 1, "v-second") is False
    assert arb.committed(path)[1] == "v-first"


def test_commit_stall_steal_interleave(spark, swapped, tmp_path):  # noqa: F811
    """The r6 'Done' interleave on BOTH backends: writer A stalls
    mid-commit for an unbounded time while B and C commit; A's resumed
    CAS must fail with ConcurrentCommitError, the log stays dense and
    single-valued, the head is C's."""
    ts = table_store
    arb = swapped
    path = str(tmp_path / "t")
    base = ts.commit(
        spark.createDataFrame([("0", 0)], "pk string, ver int"), path,
        retain=8,
    )

    stalled = threading.Event()
    release = threading.Event()
    result: dict = {}

    def slow_writer(df, vdir):
        df.write.mode("append").parquet(vdir)
        stalled.set()
        assert release.wait(60)

    def writer_a():
        try:
            ts.commit(
                spark.createDataFrame([("A", 1)], "pk string, ver int"),
                path, expected_version=base, retain=8, _writer=slow_writer,
            )
            result["a"] = "committed"
        except ts.ConcurrentCommitError:
            result["a"] = "conflict"

    ta = threading.Thread(target=writer_a)
    ta.start()
    assert stalled.wait(60)
    vb = ts.commit(
        spark.createDataFrame([("B", 2)], "pk string, ver int"),
        path, expected_version=base, retain=8,
    )
    vc = ts.commit(
        spark.createDataFrame([("C", 3)], "pk string, ver int"),
        path, expected_version=vb, retain=8,
    )
    release.set()
    ta.join(60)
    assert result["a"] == "conflict"
    committed = arb.committed(path)
    assert sorted(committed) == [1, 2, 3]
    assert committed[2] == vb and committed[3] == vc
    assert ts.current_version(path) == vc
    assert ts.read_state(spark, path).orderBy("pk").collect()[-1].pk == "C"


def test_commit_ghost_heals_by_revert(spark, swapped, tmp_path):  # noqa: F811
    """The post-CAS ghost window (ADVICE r7) heals identically on both
    backends: GC collects the claim between check and PUT → commit()
    re-verifies after winning, reverts the head, raises loudly."""
    import os
    import shutil

    ts = table_store
    arb = swapped
    path = str(tmp_path / "t")
    v1 = ts.commit(
        spark.createDataFrame([("0", 0)], "pk string, ver int"), path
    )
    real_put = arb.put_if_absent
    fired = {"done": False}

    def gc_wins_after_check(p, seq, version, _real=real_put):
        if not fired["done"] and p == path and version != v1:
            fired["done"] = True
            shutil.rmtree(os.path.join(p, version), ignore_errors=True)
        return _real(p, seq, version)

    arb.put_if_absent = gc_wins_after_check
    try:
        with pytest.raises(ts.ConcurrentCommitError, match="reverted"):
            ts.commit(
                spark.createDataFrame([("1", 1)], "pk string, ver int"),
                path,
            )
    finally:
        arb.put_if_absent = real_put
    assert ts.current_version(path) == v1
    assert [r.pk for r in ts.read_state(spark, path).collect()] == ["0"]
    ts.commit(spark.createDataFrame([("2", 2)], "pk string, ver int"), path)
    assert [r.pk for r in ts.read_state(spark, path).collect()] == ["2"]


def test_concurrent_overlap_log_dense_and_lossless(
    spark, swapped, tmp_path  # noqa: F811
):
    """4 writers × 3 unconditional commits each, fully overlapped: the
    log must be DENSE (sequences 1..12, no gaps, no doubles) and
    LOSSLESS (every version committed exactly once) on both backends."""
    ts = table_store
    arb = swapped
    path = str(tmp_path / "t")
    errs: list[Exception] = []
    barrier = threading.Barrier(4)

    def writer(i):
        try:
            barrier.wait()
            for k in range(3):
                ts.commit(
                    spark.createDataFrame(
                        [(f"{i}-{k}", i)], "pk string, ver int"
                    ),
                    path,
                    retain=16,
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    committed = arb.committed(path)
    assert sorted(committed) == list(range(1, 13))
    assert len(set(committed.values())) == 12
    assert ts.current_version(path) == committed[12]


def test_threaded_merge_upsert_on_both_backends(spark, swapped, tmp_path):
    """MERGE-level concurrency over the parametrized arbiter: 4 threads
    optimistically merge_upsert one table with CONTENDED pks (every
    thread writes every pk with its own version); after the dust
    settles, the table holds exactly the max-version row per pk
    (deterministic last-write-wins) on both backends — the conflict
    retry path exercised against the object-store CAS, not just the
    POSIX one."""
    ts = table_store
    path = str(tmp_path / "t")
    errs: list[Exception] = []
    barrier = threading.Barrier(4)

    def writer(i):
        try:
            barrier.wait()
            ts.merge_upsert(
                spark,
                spark.createDataFrame(
                    [(f"pk{k}", i, f"w{i}") for k in range(6)],
                    "pk string, ver int, val string",
                ),
                path,
                pk="pk",
                version_col="ver",
                retain=8,
                attempts=10,
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    rows = {
        r.pk: (r.ver, r.val)
        for r in ts.read_state(spark, path).collect()
    }
    assert rows == {f"pk{k}": (3, "w3") for k in range(6)}


def test_ambiguous_put_is_recovered_as_win(tmp_path):
    """The ambiguous conditional PUT (VERDICT r8 item 4): a 503 lands
    AFTER the server applied the PUT; the retry sees 412 from our own
    write. The retry client must read the key back and claim the win —
    a bare 412 would make a checked commit delete its snapshot while
    the head names it."""
    inner = object_store.InMemoryObjectStore()
    flaky = object_store.FaultInjectingObjectStore(
        inner, fault_plan={"put_if_none_match": ["ambiguous"]}
    )
    client = object_store.RetryingStoreClient(flaky)
    arb = object_store.ObjectStoreCASArbiter(client)
    path = str(tmp_path)
    assert arb.put_if_absent(path, 1, "v-0000000001") is True
    assert arb.head(path) == (1, "v-0000000001")
    # exactly one object exists — the ambiguous attempt, not a duplicate
    assert len(inner.list(arb._dir(path))) == 1


def test_ambiguous_put_still_loses_to_another_writer(tmp_path):
    """Same ambiguity, but the 503'd attempt genuinely did NOT apply
    (pure throttle) and another writer took the sequence meanwhile: the
    read-back sees the OTHER body and the retry client must report the
    loss, never a false win."""
    inner = object_store.InMemoryObjectStore()
    flaky = object_store.FaultInjectingObjectStore(
        inner, fault_plan={"put_if_none_match": ["throttle"]}
    )
    client = object_store.RetryingStoreClient(flaky)
    arb = object_store.ObjectStoreCASArbiter(client)
    path = str(tmp_path)
    # rival lands while our first attempt is throttled
    rival = object_store.ObjectStoreCASArbiter(inner)
    assert rival.put_if_absent(path, 1, "v-rival")
    assert arb.put_if_absent(path, 1, "v-0000000001") is False
    assert arb.head(path) == (1, "v-rival")


def test_paginated_list_drains_all_pages(tmp_path):
    """committed()/head()/prune() must see EVERY key when the transport
    pages (S3 pages at 1 000; page_size=1 forces one key per page)."""
    store = object_store.InMemoryObjectStore(page_size=1)
    arb = object_store.ObjectStoreCASArbiter(store)
    path = str(tmp_path)
    for seq in range(1, 8):
        assert arb.put_if_absent(path, seq, f"v-{seq:010d}")
    assert arb.head(path) == (7, "v-0000000007")
    assert sorted(arb.committed(path)) == list(range(1, 8))
    arb.prune(path, keep_newest=2)
    assert sorted(arb.committed(path)) == [6, 7]


def test_transient_get_after_winning_put_retries(tmp_path):
    """head() right after a winning PUT hits a transient get failure —
    the retry client absorbs it and head() still serves the commit."""
    inner = object_store.InMemoryObjectStore()
    flaky = object_store.FaultInjectingObjectStore(
        inner, fault_plan={"get": ["throttle", "throttle"]}
    )
    client = object_store.RetryingStoreClient(flaky)
    arb = object_store.ObjectStoreCASArbiter(client)
    path = str(tmp_path)
    assert arb.put_if_absent(path, 1, "v-0000000001")
    assert arb.head(path) == (1, "v-0000000001")


def test_retry_budget_exhaustion_surfaces_the_503(tmp_path):
    """A store throttling EVERY call defeats the retry budget: the
    client must surface TransientStoreError, never hang or fabricate
    an answer."""
    flaky = object_store.FaultInjectingObjectStore(
        object_store.InMemoryObjectStore(), throttle_every=1
    )
    client = object_store.RetryingStoreClient(flaky, max_attempts=3)
    arb = object_store.ObjectStoreCASArbiter(client)
    with pytest.raises(object_store.TransientStoreError):
        arb.head(str(tmp_path))


def test_checked_commit_survives_ambiguous_put(spark, tmp_path):
    """End-to-end through table_store.commit(): the FIRST conditional
    PUT of a checked merge is ambiguous; without read-back recovery the
    commit would raise ConcurrentCommitError and delete the snapshot the
    head now names. With it, the commit returns normally and the table
    reads back the merged rows."""
    inner = object_store.InMemoryObjectStore()
    flaky = object_store.FaultInjectingObjectStore(
        inner, fault_plan={"put_if_none_match": ["ok", "ambiguous"]}
    )
    client = object_store.RetryingStoreClient(flaky)
    arb = object_store.ObjectStoreCASArbiter(client)
    prev = table_store._ARBITER
    table_store.set_arbiter(arb)
    try:
        path = str(tmp_path / "t")
        df1 = spark.createDataFrame([(1, "a", 0)], "k long, v string, ver long")
        table_store.merge_upsert(spark, df1, path, pk="k", version_col="ver")
        df2 = spark.createDataFrame([(2, "b", 1)], "k long, v string, ver long")
        table_store.merge_upsert(spark, df2, path, pk="k", version_col="ver")
        got = {
            (r.k, r.v)
            for r in table_store.read_state(spark, path)
            .select("k", "v")
            .collect()
        }
        assert got == {(1, "a"), (2, "b")}
    finally:
        table_store.set_arbiter(prev)


def test_s3_adapter_maps_retryable_codes(tmp_path):
    """The adapter maps throttling/5xx service errors to
    TransientStoreError (so the retry wrapper's budget applies
    uniformly) and re-raises non-service exceptions unmapped."""

    class _Throttle(_FakeBoto3Client):
        def __init__(self, store):
            super().__init__(store)
            self.thrown = 0

        def get_object(self, Bucket, Key):
            if self.thrown < 2:
                self.thrown += 1
                raise _FakeServiceError("SlowDown", "get_object")
            return super().get_object(Bucket, Key)

    inner = object_store.InMemoryObjectStore()
    client = _Throttle(inner)
    adapter = object_store.S3ObjectStore(bucket="b", client=client)
    inner.force_put("k", b"v")
    with pytest.raises(object_store.TransientStoreError):
        adapter.get("k")
    # wrapped, the budget absorbs both throttles
    wrapped = object_store.RetryingStoreClient(
        object_store.S3ObjectStore(bucket="b", client=_Throttle(inner))
    )
    assert wrapped.get("k") == b"v"
    # a non-service exception passes through unmapped
    class _Broken(_FakeBoto3Client):
        def get_object(self, Bucket, Key):
            raise RuntimeError("socket teardown")

    broken = object_store.S3ObjectStore(
        bucket="b", client=_Broken(inner)
    )
    with pytest.raises(RuntimeError):
        broken.get("k")


def test_s3_adapter_routes_puts_through_dedicated_put_client():
    """ADVICE r9 (high): the conditional PUT must be issued through a
    client whose INTERNAL retries are disabled
    (Config(retries={'total_max_attempts': 1})) — botocore silently
    retrying a conditional PUT whose first attempt was applied before
    the response was lost surfaces a bare 412, RetryingStoreClient
    never sees the TransientStoreError, skips the ambiguous-outcome
    read-back, and the caller deletes a snapshot the head names. This
    pins the routing: put_object goes to put_client; get/list/delete
    go to the standard-retry client."""
    inner = object_store.InMemoryObjectStore()

    class _Recording(_FakeBoto3Client):
        def __init__(self, store, log, tag):
            super().__init__(store)
            self._log, self._tag = log, tag

        def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
            self._log.append((self._tag, "put"))
            return super().put_object(Bucket, Key, Body, IfNoneMatch)

        def get_object(self, Bucket, Key):
            self._log.append((self._tag, "get"))
            return super().get_object(Bucket, Key)

        def delete_object(self, Bucket, Key):
            self._log.append((self._tag, "delete"))
            return super().delete_object(Bucket, Key)

    log = []
    adapter = object_store.S3ObjectStore(
        bucket="b",
        client=_Recording(inner, log, "read"),
        put_client=_Recording(inner, log, "put-once"),
    )
    assert adapter.put_if_none_match("k", b"v") is True
    assert adapter.get("k") == b"v"
    assert adapter.put_if_none_match("k", b"w") is False  # 412 path
    adapter.delete("k")
    assert log == [
        ("put-once", "put"),
        ("read", "get"),
        ("put-once", "put"),
        ("read", "delete"),
    ]
    # injected single client still serves both roles (all fakes lack an
    # internal retry loop, so the hazard doesn't exist in-process)
    log2 = []
    single = object_store.S3ObjectStore(
        bucket="b", client=_Recording(inner, log2, "both")
    )
    single.put_if_none_match("k2", b"v")
    single.get("k2")
    assert [t for t, _ in log2] == ["both", "both"]


def test_s3_adapter_requires_no_retry_put_client_for_real_clients():
    """ADVICE r10 (medium): a caller injecting a REAL botocore-shaped
    client (duck-typed by client.meta.config) without put_client must be
    rejected unless that client's own retries are disabled — silently
    falling back to it for conditional PUTs would reintroduce the
    applied-then-retried bare-412 data loss. Test fakes without the
    botocore shape keep the single-client fallback."""
    import pytest

    class _Cfg:
        def __init__(self, retries):
            self.retries = retries

    class _Meta:
        def __init__(self, retries):
            self.config = _Cfg(retries)

    def shaped(retries):
        c = _FakeBoto3Client(object_store.InMemoryObjectStore())
        c.meta = _Meta(retries)
        return c

    # explicit internal retries → rejected
    with pytest.raises(ValueError, match="put_client"):
        object_store.S3ObjectStore(
            "b", client=shaped({"mode": "standard", "max_attempts": 3})
        )
    # retries UNSET still means botocore's default retry loop → rejected
    with pytest.raises(ValueError, match="put_client"):
        object_store.S3ObjectStore("b", client=shaped(None))
    # ADVICE r11 (medium): 'max_attempts' EXCLUDES the initial request —
    # retries={'max_attempts': 1} normalizes to total_max_attempts=2,
    # i.e. ONE silent internal retry, the exact hazard. Rejected.
    with pytest.raises(ValueError, match="put_client"):
        object_store.S3ObjectStore("b", client=shaped({"max_attempts": 1}))
    # ... and total_max_attempts=2 (explicit) is equally unsafe
    with pytest.raises(ValueError, match="put_client"):
        object_store.S3ObjectStore(
            "b", client=shaped({"total_max_attempts": 2})
        )
    # retries disabled → the shapes safe to serve both roles:
    # total_max_attempts == 1, or its exact alias max_attempts == 0
    ok = object_store.S3ObjectStore(
        "b", client=shaped({"total_max_attempts": 1})
    )
    assert ok._put_c is ok._c
    ok0 = object_store.S3ObjectStore(
        "b", client=shaped({"max_attempts": 0})
    )
    assert ok0._put_c is ok0._c
    # total_max_attempts wins over a contradictory max_attempts alias
    with pytest.raises(ValueError, match="put_client"):
        object_store.S3ObjectStore(
            "b",
            client=shaped({"total_max_attempts": 2, "max_attempts": 0}),
        )
    # a rejected client becomes acceptable once put_client is explicit
    inner = object_store.InMemoryObjectStore()
    both = object_store.S3ObjectStore(
        "b",
        client=shaped({"mode": "standard"}),
        put_client=_FakeBoto3Client(inner),
    )
    assert both._put_c is not both._c
    # fakes without the botocore shape: fallback unchanged
    plain = object_store.S3ObjectStore(
        "b", client=_FakeBoto3Client(inner)
    )
    assert plain._put_c is plain._c


def test_s3_adapter_call_mapping_against_real_botocore():
    """Round 11 (boto3 appeared in the image — INTEGRATIONS §4
    activation): the adapter's per-call mapping pinned against the REAL
    botocore machinery via Stubber — genuine param validation (the
    IfNoneMatch member exists in the service model), genuine
    ClientError shapes: 412 → False, retryable 503 → TransientStoreError,
    NoSuchKey → KeyError, and a paged paginator drained."""
    import io

    boto3 = pytest.importorskip("boto3")
    from botocore.config import Config
    from botocore.response import StreamingBody
    from botocore.stub import Stubber

    kw = dict(
        region_name="us-east-1",
        aws_access_key_id="t",
        aws_secret_access_key="t",
    )
    put_c = boto3.client(
        "s3", config=Config(retries={"total_max_attempts": 1}), **kw
    )
    get_c = boto3.client(
        "s3", config=Config(retries={"total_max_attempts": 1}), **kw
    )
    store = object_store.S3ObjectStore(
        "b", client=get_c, put_client=put_c
    )
    puts = Stubber(put_c)
    want = {"Bucket": "b", "Key": "k", "Body": b"v", "IfNoneMatch": "*"}
    puts.add_response("put_object", {}, want)
    puts.add_client_error(
        "put_object", "PreconditionFailed", http_status_code=412,
        expected_params=want,
    )
    puts.add_client_error(
        "put_object", "SlowDown", http_status_code=503,
        expected_params=want,
    )
    gets = Stubber(get_c)
    body = b"hello"
    gets.add_response(
        "get_object",
        {"Body": StreamingBody(io.BytesIO(body), len(body))},
        {"Bucket": "b", "Key": "k"},
    )
    gets.add_client_error(
        "get_object", "NoSuchKey", http_status_code=404,
        expected_params={"Bucket": "b", "Key": "gone"},
    )
    gets.add_response(
        "list_objects_v2",
        {
            "Contents": [{"Key": "p/0"}, {"Key": "p/1"}],
            "IsTruncated": True,
            "NextContinuationToken": "tok",
        },
        {"Bucket": "b", "Prefix": "p/"},
    )
    gets.add_response(
        "list_objects_v2",
        {"Contents": [{"Key": "p/2"}], "IsTruncated": False},
        {"Bucket": "b", "Prefix": "p/", "ContinuationToken": "tok"},
    )
    gets.add_response(
        "delete_object", {}, {"Bucket": "b", "Key": "k"}
    )
    with puts, gets:
        assert store.put_if_none_match("k", b"v") is True
        assert store.put_if_none_match("k", b"v") is False
        with pytest.raises(object_store.TransientStoreError):
            store.put_if_none_match("k", b"v")
        assert store.get("k") == b"hello"
        with pytest.raises(KeyError):
            store.get("gone")
        assert store.list("p/") == ["p/0", "p/1", "p/2"]
        store.delete("k")


def test_s3_adapter_default_construction_splits_retry_clients():
    """Round 11 activation of the previously-uncoverable default build
    path: with real boto3 present, S3ObjectStore() must construct TWO
    clients — standard retries for get/list/delete, ONE total attempt
    for the conditional PUT — and injecting a real default-config
    client without put_client must hit the ADVICE-r10 guard live
    (botocore's default retries are a dict without total_max_attempts
    == 1)."""
    boto3 = pytest.importorskip("boto3")

    store = object_store.S3ObjectStore("some-bucket")
    assert store._c is not store._put_c
    assert store._c.meta.config.retries.get("mode") == "standard"
    assert store._put_c.meta.config.retries.get("total_max_attempts") == 1
    with pytest.raises(ValueError, match="put_client"):
        object_store.S3ObjectStore(
            "some-bucket", client=boto3.client("s3", region_name="us-east-1")
        )
