"""Object-store commit arbiter: the S3 conditional-PUT protocol behind
``table_store.set_arbiter`` (VERDICT r7 item 3).

``LocalCASArbiter`` realizes commit-by-conditional-PUT on POSIX via
``os.link``; this module realizes the SAME observable contract on an
object store speaking ``If-None-Match: *`` semantics — the design Delta
Lake uses for S3 multi-writer commits, available natively on S3 since
2024 (and forever on ADLS/GCS as PutIfAbsent / ifGenerationMatch=0).
``commit()``, ``merge_upsert``, and every call site are unchanged:
``set_arbiter(ObjectStoreCASArbiter(store))`` swaps the backend.

The store client is FOUR calls (the exact boto3 mapping in each
docstring); ``InMemoryObjectStore`` is the in-process reference
implementation honoring precondition-failed semantics atomically, used
by the parametrized contract suite (tests/test_arbiter_contract.py) to
prove both backends interchangeable. Assumes read-after-write strong
consistency, which S3 has guaranteed since 2020 — list-after-put is
immediately visible.

Snapshot DATA in this hybrid deployment stays wherever the table lives
(the arbiter arbitrates only the commit log); a full object-store table
additionally maps the ``v-*/`` prefixes to keys, which is a storage
concern orthogonal to commit arbitration.
"""
from __future__ import annotations

import threading
from urllib.parse import quote


class InMemoryObjectStore:
    """In-process object store honoring conditional-PUT semantics.

    The four-call client protocol an S3 adapter implements with boto3:

    - ``put_if_none_match(key, body) -> bool`` — atomic create-if-absent;
      False when the key exists (S3: ``put_object(..., IfNoneMatch='*')``
      catching the 412 ``PreconditionFailed`` ClientError).
    - ``get(key) -> bytes`` — raises KeyError when absent (``get_object``
      catching ``NoSuchKey``).
    - ``list(prefix) -> list[str]`` — keys under prefix
      (``list_objects_v2(Prefix=...)``, paginated).
    - ``delete(key) -> None`` — idempotent (``delete_object``; S3 returns
      204 whether or not the key existed).

    All four are linearizable here (one lock), matching S3's strong
    read-after-write consistency model.
    """

    def __init__(self) -> None:
        self._objects: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def put_if_none_match(self, key: str, body: bytes) -> bool:
        with self._lock:
            if key in self._objects:
                return False
            self._objects[key] = bytes(body)
            return True

    def get(self, key: str) -> bytes:
        with self._lock:
            return self._objects[key]  # KeyError = NoSuchKey

    def list(self, prefix: str) -> list[str]:
        with self._lock:
            return sorted(k for k in self._objects if k.startswith(prefix))

    def delete(self, key: str) -> None:
        with self._lock:
            self._objects.pop(key, None)

    # test hook, NOT part of the client protocol: plant a foreign key the
    # way an external tool writing the bucket directly would
    def force_put(self, key: str, body: bytes) -> None:
        with self._lock:
            self._objects[key] = bytes(body)


class ObjectStoreCASArbiter:
    """``LocalCASArbiter``'s contract over an object store: one
    conditional PUT per commit sequence, derived head, tolerant scans.

    Differences from the POSIX realization are all simplifications:
    there is no temp-claim staging (a conditional PUT is one atomic
    call, so the ``.claim`` grace timer and its prune sweep don't
    exist), and a torn commit record is impossible by store contract
    (a PUT is all-or-nothing). Foreign-named keys under ``_commits/``
    are tolerated exactly as locally: non-decimal names are ignored,
    non-padded decimal spellings are served by head() and pruned by
    their listed name (ADVICE r7 parity).
    """

    def __init__(self, store, prefix: str = "rdw") -> None:
        self._store = store
        self._prefix = prefix.rstrip("/")

    def _dir(self, path: str) -> str:
        # the table's local path IS the namespace: quote it into one key
        # segment so distinct paths can never collide or nest
        return f"{self._prefix}/{quote(path, safe='')}/_commits/"

    def committed(self, path: str) -> dict[int, str]:
        """All committed sequences → version names (empty pre-arbiter)."""
        out: dict[int, str] = {}
        d = self._dir(path)
        for key in self._store.list(d):
            name = key[len(d):]
            if not (name.isascii() and name.isdigit()):
                continue
            try:
                out[int(name)] = self._store.get(key).decode("utf-8").strip()
            except KeyError:
                continue  # concurrently pruned
        return out

    def head(self, path: str) -> tuple[int, str | None]:
        """(max committed sequence, its version) — (0, None) pre-arbiter.
        One list + ONE get, re-listing if the max was concurrently
        pruned — the same hot-path shape as the local head()."""
        d = self._dir(path)
        while True:
            numbered = [
                (int(k[len(d):]), k)
                for k in self._store.list(d)
                if k[len(d):].isascii() and k[len(d):].isdigit()
            ]
            if not numbered:
                return 0, None
            seq, key = max(numbered)
            try:
                return seq, self._store.get(key).decode("utf-8").strip()
            except KeyError:
                continue  # concurrently pruned — re-derive

    def put_if_absent(self, path: str, seq: int, version: str) -> bool:
        """Commit ``version`` as sequence ``seq`` via ONE conditional PUT
        (``If-None-Match: *``); False = the sequence was taken (412)."""
        return self._store.put_if_none_match(
            self._dir(path) + f"{seq:010d}", version.encode("utf-8")
        )

    def prune(self, path: str, keep_newest: int) -> None:
        """Drop sequence keys beyond the newest ``keep_newest`` DISTINCT
        sequences, deleting by listed name (duplicate spellings of a
        kept sequence are kept with it — local-parity, ADVICE r7)."""
        d = self._dir(path)
        numbered = sorted(
            (
                (int(k[len(d):]), k)
                for k in self._store.list(d)
                if k[len(d):].isascii() and k[len(d):].isdigit()
            ),
            reverse=True,
        )
        kept: set[int] = set()
        for s, key in numbered:
            if s in kept or len(kept) < max(keep_newest, 1):
                kept.add(s)
                continue
            self._store.delete(key)
