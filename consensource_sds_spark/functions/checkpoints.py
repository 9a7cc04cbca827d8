"""Eager release of superseded ``localCheckpoint`` storage.

A localCheckpoint truncates lineage, so its blocks ARE the data — and
ContextCleaner only frees them after a JVM GC notices the Dataset has
become unreachable. Anywhere checkpoints are created repeatedly (the BPE
trainers' per-round vocab/counts, connected-components' per-round edge
frame, the streaming lanes' per-BATCH materializations), that GC lag is
the effective storage footprint: measured over a 128-round incremental
BPE training, the live-checkpoint envelope oscillated up to 59 RDDs /
355 MB (249 MB still held at the end) purely from cleanup lag — at
production sizes (GB-scale checkpoints, thousands of rounds/batches)
that is tens of GB of executor storage the job doesn't need, evicted
only on memory pressure. With the eager free the same run peaks at 3
RDDs / 19 MB and ends at zero, and wall-clock improves ~10-15% in a
same-session A/B from the reduced GC pressure.

Contract: free a checkpoint only once its successor (or the write that
consumed it) has MATERIALIZED and the frame can never be read again. A
freed checkpoint fails LOUDLY on read (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND
— blocks gone, lineage truncated), it never silently recomputes, so
misuse is a crash, not a wrong answer (pinned in test_bpe_property.py).

Best-effort by design: the plan-RDD accessor is a JVM internal, so any
failure (non-checkpoint frame, API drift) degrades to the GC-lag
behavior above, never to an error; the test pin turns accessor drift on
a Spark upgrade into a visible failure instead of a silent no-op.
"""

from __future__ import annotations


def free_local_checkpoint(df) -> None:
    """Release a SUPERSEDED localCheckpoint's storage blocks now."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
