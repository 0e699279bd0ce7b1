"""NATS JetStream source adapter — parity with the reference's actual bus.

The reference consumes a JetStream durable pull consumer
(src/nats.rs:63-83: durable_name, filter_subjects, AckPolicy::Explicit,
ack_wait=120s, max_ack_pending=200_000, max_bytes=5_000_000 per fetch,
max_deliver=3; connection/stream config in config/default.toml:10-28) and
acks each message after the ClickHouse insert (src/handler.rs:119-135) —
at-least-once delivery.

Spark has no first-party NATS connector, so this module provides the two
pieces a reference-stack operator needs:

1. :func:`nats_to_wire` — route a NATS-message-shaped DataFrame through
   the same ``(subject, payload)`` wire contract every other source mode
   uses (``streaming/pipeline.py:process_batch``), with within-batch
   redelivery dedup on the JetStream stream sequence.

2. :class:`NatsBridge` — the durable JetStream -> spool-file pump: each
   fetch becomes one atomically-renamed JSON-lines file in a spool
   directory that the checkpointed file-source ingest
   (``streaming/pipeline.py:start_ingest``) consumes, and messages are
   acked only AFTER their spool file is durable.  Composition is
   at-least-once end-to-end, exactly the reference's ack-after-insert
   contract:

     JetStream (reference)            this bridge
     ---------------------            -----------
     durable pull consumer            injected client's fetch()
     ack after CH insert              ack after spool-file rename;
       (at-least-once)                  file->warehouse leg is the
                                        checkpointed at-least-once ingest
     ack_wait=120s redelivery         unacked fetch (spool failure) is
                                        redelivered by the server
     max_ack_pending=200k             fetch cap ``max_msgs``
     fetch max_bytes=5MB              fetch cap ``max_bytes``
     max_deliver=3                    server-side (client unchanged);
                                        undecodable payloads land in the
                                        warehouse DLQ instead of looping

The concrete client is injected (duck-typed ``fetch``/``ack``), so the
bridge is fully testable without a broker; :func:`connect_nats` builds a
real client from the public ``nats-py`` package when it is installed.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nats_to_wire(df: DataFrame) -> DataFrame:
    """Map a NATS/JetStream-message-shaped frame onto the wire contract
    ``(subject, payload)`` that ``process_batch`` routes on.

    Expected columns: ``subject`` (string), ``data`` (binary — the
    message payload), and optionally the JetStream metadata columns
    ``stream_seq`` (long) and ``num_delivered`` (int).

    Redelivery handling: JetStream redelivers an unacked message with
    the SAME ``stream_seq`` and an incremented ``num_delivered``
    (src/nats.rs:72-76 — ack_wait/max_deliver).  When the metadata
    columns are present, a batch that carries both the original and a
    redelivery keeps exactly one copy (the lowest ``num_delivered``) —
    a map-side-combinable groupBy on the 8-byte sequence, not a window.
    Cross-batch duplicates remain possible (at-least-once, same as the
    reference's ack-after-insert)."""
    cols = set(df.columns)
    wire = df.select(
        "*",
        F.col("data").cast("string").alias("payload"),
    )
    if "stream_seq" in cols:
        order = (
            [F.col("num_delivered").asc_nulls_last()]
            if "num_delivered" in cols
            else []
        )
        if order:
            wire = wire.groupBy("subject", "stream_seq").agg(
                F.min_by("payload", F.col("num_delivered")).alias("payload")
            )
        else:
            wire = wire.groupBy("subject", "stream_seq").agg(
                F.first("payload").alias("payload")
            )
    return wire.select("subject", "payload")


class NatsBridge:
    """JetStream -> spool-directory pump with ack-after-durable-write.

    ``client`` is duck-typed: ``fetch(max_msgs, max_bytes) -> list`` of
    message objects carrying ``.subject`` (str), ``.data`` (bytes) and
    ``.ack()``.  A real client from :func:`connect_nats` satisfies this;
    tests inject a fake.

    Fetch caps default to the reference consumer's knobs
    (src/nats.rs:72-76): ``max_msgs`` plays max_ack_pending /
    batcher.max_rows, ``max_bytes`` the pull fetch byte cap."""

    def __init__(
        self,
        client,
        spool_dir: str,
        max_msgs: int = 100_000,
        max_bytes: int = 5_000_000,
    ) -> None:
        self.client = client
        self.spool_dir = spool_dir
        self.max_msgs = max_msgs
        self.max_bytes = max_bytes
        os.makedirs(spool_dir, exist_ok=True)

    def pump_once(self) -> int:
        """One fetch -> one spool file -> acks.  Returns messages moved.

        The spool file is written to a dotfile (ignored by Spark's file
        source) and renamed into place only when complete — a crash
        mid-write leaves no partial batch visible, the unacked messages
        redeliver after ack_wait, and the next pump re-spools them.
        Acks run strictly after the rename: the at-least-once handoff."""
        msgs = self.client.fetch(self.max_msgs, self.max_bytes)
        if not msgs:
            return 0
        name = f"batch-{uuid.uuid4().hex}.json"
        tmp = os.path.join(self.spool_dir, "." + name)
        final = os.path.join(self.spool_dir, name)
        with open(tmp, "w", encoding="utf-8") as f:
            for m in msgs:
                f.write(
                    json.dumps(
                        {
                            "subject": m.subject,
                            "payload": m.data.decode("utf-8", "replace"),
                        }
                    )
                    + "\n"
                )
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)
        for m in msgs:
            m.ack()
        return len(msgs)

    def pump_until_empty(self, max_rounds: int = 1_000_000) -> int:
        """Drain the consumer: pump until a fetch comes back empty."""
        total = 0
        for _ in range(max_rounds):
            n = self.pump_once()
            if n == 0:
                break
            total += n
        return total


def start_ingest_nats(
    spark,
    bridge: NatsBridge,
    warehouse: str,
    checkpoint: str,
    **kw,
):
    """NATS-mode ingestion: the checkpointed file-source ingest
    (``start_ingest``) running over the bridge's spool directory.  The
    caller drives ``bridge.pump_once()`` on its own cadence (or a
    trivial timer thread); every spooled batch flows through the same
    route/decode/DLQ/append path as every other source mode."""
    from ed_clickhouse_spark.streaming.pipeline import start_ingest

    return start_ingest(spark, bridge.spool_dir, warehouse, checkpoint, **kw)


def connect_nats(
    url: str,
    stream: str,
    durable: str,
    subjects: list[str],
    ack_wait_s: int = 120,
    max_ack_pending: int = 200_000,
    max_deliver: int = 3,
):
    """Build a synchronous fetch/ack client over the public ``nats-py``
    package, configured exactly like the reference consumer
    (src/nats.rs:63-83).  Import-guarded: the package is not part of
    this engine's pinned environment, so without it this raises with
    the bridge recipe instead of failing obscurely."""
    try:
        import asyncio

        import nats  # public nats-py package
        from nats.js.api import AckPolicy, ConsumerConfig
    except ImportError as exc:  # pragma: no cover - env without nats-py
        raise NotImplementedError(
            "nats-py is not installed. Either `pip install nats-py` for "
            "this direct adapter, or bridge externally: run any "
            "JetStream consumer that appends fetched messages as "
            '{"subject": ..., "payload": ...} JSON lines into a spool '
            "directory and acks after the file rename, then point "
            "start_ingest at that directory (NatsBridge implements this "
            "loop given a fetch/ack client)."
        ) from exc

    class _SyncJetStream:  # pragma: no cover - needs a live broker
        def __init__(self) -> None:
            self._loop = asyncio.new_event_loop()
            self._nc = self._loop.run_until_complete(nats.connect(url))
            js = self._nc.jetstream()
            self._sub = self._loop.run_until_complete(
                js.pull_subscribe(
                    subject="",
                    durable=durable,
                    stream=stream,
                    config=ConsumerConfig(
                        durable_name=durable,
                        filter_subjects=subjects,
                        ack_policy=AckPolicy.EXPLICIT,
                        ack_wait=ack_wait_s,
                        max_ack_pending=max_ack_pending,
                        max_deliver=max_deliver,
                    ),
                )
            )

        def fetch(self, max_msgs: int, max_bytes: int) -> list:
            import nats.errors

            # Cap the PULL REQUEST itself with the protocol's byte
            # budget (the reference does the same via the pull request's
            # max_bytes — src/nats.rs): messages the server never sends
            # can't sit unacked. Older nats-py fetch() lacks the kwarg —
            # fall back to an uncapped fetch there.
            try:
                raw = self._loop.run_until_complete(
                    self._sub.fetch(
                        batch=max_msgs, timeout=5, max_bytes=max_bytes
                    )
                )
            except TypeError:
                try:
                    raw = self._loop.run_until_complete(
                        self._sub.fetch(batch=max_msgs, timeout=5)
                    )
                except nats.errors.TimeoutError:
                    return []
            except nats.errors.TimeoutError:
                return []
            loop = self._loop

            class _Msg:
                def __init__(self, m) -> None:
                    self.subject = m.subject
                    self.data = m.data
                    self._m = m

                def ack(self) -> None:
                    loop.run_until_complete(self._m.ack())

            out, used = [], 0
            overflow = []
            for m in raw:
                if used >= max_bytes:
                    overflow.append(m)
                    continue
                used += len(m.data)
                out.append(_Msg(m))
            # Anything past the byte budget (only possible on the
            # uncapped fallback) was already DELIVERED to this consumer:
            # dropping it silently would stall ingestion for ack_wait
            # (120 s) until redelivery. nak() hands it back immediately.
            for m in overflow:
                try:
                    loop.run_until_complete(m.nak())
                except Exception:
                    pass  # redelivers after ack_wait — degraded, not lost
            return out

        def close(self) -> None:
            self._loop.run_until_complete(self._nc.close())
            self._loop.close()

    return _SyncJetStream()
