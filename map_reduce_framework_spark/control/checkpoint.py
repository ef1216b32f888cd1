"""Job-manifest checkpointing (Tier 3 behavioral parity).

The reference's Tier-3 coordinator JSON-marshals {Tasks, Phase, WorkerLeases},
writes atomically via temp-file + rename, throttles to >=100 ms between
checkpoints, and a backup takes over from the file on primary silence
(go-map-reduce-framework/mr/coordinator_tier.go:262-298,
mr/backup_coordinator.go:27-71).

Spark's lineage makes *task* state checkpointing unnecessary, so the
meaningful unit for a batch engine is the **job manifest**: which queries of
a multi-query run have committed results. A restarted driver (the
"backup coordinator") resumes from the manifest and re-runs only missing
queries -- task-level recovery inside a query is Spark's job.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class JobManifest:
    """Atomic, throttled manifest of completed work items.

    Mirrors the reference mechanics exactly where they matter for crash
    safety: temp-file + rename (atomic on POSIX, coordinator_tier.go:278-288)
    and a minimum interval between writes (>=100 ms throttle,
    coordinator_tier.go:269-274 -- ``min_interval=0`` disables, used in
    tests). Readers never observe a torn file.
    """

    path: str
    min_interval: float = 0.100
    _last_write: float = field(default=0.0, init=False)
    _state: dict[str, Any] = field(default_factory=dict, init=False)

    def __post_init__(self) -> None:
        if os.path.exists(self.path):
            with open(self.path) as fh:
                self._state = json.load(fh)
        else:
            self._state = {"completed": {}, "phase": "idle"}

    @property
    def completed(self) -> dict[str, Any]:
        return self._state["completed"]

    def is_done(self, name: str) -> bool:
        return name in self._state["completed"]

    def mark_done(self, name: str, meta: Any = None, *, force: bool = False) -> None:
        self._state["completed"][name] = {"ts": time.time(), "meta": meta}
        self._write(force=force)

    def set_phase(self, phase: str) -> None:
        self._state["phase"] = phase
        self._write(force=True)

    def _write(self, *, force: bool = False) -> None:
        now = time.time()
        if not force and now - self._last_write < self.min_interval:
            return  # throttled; state is still in memory and written later
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(os.path.abspath(self.path)) or ".",
            prefix=".manifest-",
        )
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump(self._state, fh)
            os.rename(tmp, self.path)  # atomic commit
            self._last_write = now
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def flush(self) -> None:
        self._write(force=True)

    def touch(self) -> None:
        """Heartbeat: refresh the manifest mtime without changing state.
        A primary inside a long-running query calls this periodically so
        the backup's staleness watch (mtime-based, like
        backup_coordinator.go:41-47) doesn't fire mid-query."""
        os.utime(self.path)


def run_with_manifest(
    manifest: JobManifest,
    jobs: dict[str, Callable[[], Any]],
) -> dict[str, Any]:
    """Execute ``jobs`` skipping entries already committed in the manifest --
    the resume path a backup driver takes after primary failure. Returns
    {name: result-or-None(skipped)}."""
    results: dict[str, Any] = {}
    manifest.set_phase("running")
    for name, job in jobs.items():
        if manifest.is_done(name):
            results[name] = None
            continue
        results[name] = job()
        manifest.mark_done(name, force=True)
    manifest.set_phase("done")
    return results


class BackupCoordinator:
    """Standby driver that takes over a multi-query run when the primary
    goes silent (mr/backup_coordinator.go:27-71; lease at :22).

    Failure detection is the reference's: stat the manifest and treat
    mtime staleness beyond ``lease_timeout`` as primary death -- a missing
    manifest means the primary hasn't started, never a failure. Failover
    re-reads the manifest from disk (the atomic-rename writes guarantee it
    is never torn) and resumes ``run_with_manifest``, which skips every
    query the primary already committed: each query commits exactly once
    across both drivers.
    """

    def __init__(
        self,
        manifest_path: str,
        jobs: dict[str, Callable[[], Any]],
        lease_timeout: float = 5.0,
        poll_interval: float = 1.0,
    ) -> None:
        self.manifest_path = manifest_path
        self.jobs = jobs
        self.lease_timeout = lease_timeout
        self.poll_interval = poll_interval
        self.active = False  # True once this backup has taken over

    def check_primary_failure(self) -> bool:
        """backup_coordinator.go:41-47: stat error -> not a failure."""
        try:
            mtime = os.stat(self.manifest_path).st_mtime
        except OSError:
            return False
        return time.time() - mtime > self.lease_timeout

    def _primary_finished(self) -> bool:
        try:
            with open(self.manifest_path) as fh:
                return json.load(fh).get("phase") == "done"
        except (OSError, ValueError):
            return False

    def failover(self) -> dict[str, Any]:
        """Load the manifest and finish the job. Idempotent: a second call
        on an already-active backup is a no-op (mr/backup_coordinator.go:55-57)."""
        if self.active:
            return {}
        self.active = True
        manifest = JobManifest(self.manifest_path)  # re-read committed state
        return run_with_manifest(manifest, self.jobs)

    def monitor(self, max_wait: float | None = None) -> dict[str, Any] | None:
        """Poll until the primary finishes (returns None), dies (failover,
        returns its results), or ``max_wait`` elapses (returns None)."""
        deadline = None if max_wait is None else time.time() + max_wait
        while deadline is None or time.time() < deadline:
            if self._primary_finished():
                return None
            if self.check_primary_failure():
                return self.failover()
            time.sleep(self.poll_interval)
        return None
