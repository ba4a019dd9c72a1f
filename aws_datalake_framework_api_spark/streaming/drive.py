"""Drive a checkpointed ``availableNow`` stream to completion.

Every stream in this engine is a bounded backlog drain: a
``checkpointLocation`` plus ``Trigger.AvailableNow`` (single-batch
fallback on the Python sources), with per-batch idempotence — the file
sink's commit log skips committed batches, and every ``foreachBatch``
merge gates on a batch-id watermark read before applying.  That makes
a RESTART of the whole query semantically free: committed work is
skipped, uncommitted work replays once.

The one failure worth restarting on automatically is the JVM's
Python-worker spawn timeout (``Python worker failed to connect back``):
``PythonWorkerFactory.createSimpleWorker`` waits a hard-coded
``PROCESS_WAIT_TIMEOUT_MS = 10000`` for the freshly launched Python
process to connect back (verified by javap over the installed Spark
4.1.2 spark-core jar — no conf raises it), and a loaded box can miss
that window while importing pyspark in the new process.  Observed in
this round's opening bench: one run died exactly there, in
``PythonStreamingSourceRunner.init`` at stream INITIALIZING, before
any offset was committed.  A measurement harness that dies on a 10 s
co-tenant stall measures the neighbor, not the engine, so the drive
loop retries exactly this signature and re-raises everything else
unchanged.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql.streaming import StreamingQuery

#: Error-text signature of the transient worker-spawn timeout.  Kept
#: deliberately narrow: a real source/sink bug must still fail loudly
#: on the first throw.
_TRANSIENT_SIGNATURES = ("Python worker failed to connect back",)

#: Total attempts (1 original + retries).  Two retries bound the added
#: worst-case latency at ~2 spawn timeouts while covering the observed
#: single-blip failure mode.
_ATTEMPTS = 3


def _is_transient(exc: BaseException) -> bool:
    msg = str(exc)
    return any(sig in msg for sig in _TRANSIENT_SIGNATURES)


def run_stream_to_completion(
    start: Callable[[], StreamingQuery], attempts: int = _ATTEMPTS
) -> None:
    """Start the stream via ``start()`` and await termination,
    restarting (same checkpoint, so committed batches are skipped) on
    the transient Python-worker spawn timeout only."""
    for attempt in range(attempts):
        q = start()
        try:
            q.awaitTermination()
            return
        except Exception as exc:  # noqa: BLE001 — filtered below
            if not _is_transient(exc) or attempt == attempts - 1:
                raise
            # brief backoff: the spawn timed out because the box was
            # momentarily saturated; give it a beat before re-forking
            time.sleep(1.0 + attempt)
