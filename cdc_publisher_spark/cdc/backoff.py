"""R1 — retry backoff (reference: /root/reference/src/cdc_publisher/retry.clj).

The reference's supervised process loop retries a failing operation up
to 10 times with cubic backoff ``max(5, 5 * round(attempt^3 / 5))``
seconds (retry.clj:11-17; fixture table in FIXTURES.md §2), resetting
the attempt counter on success. In the Spark engine this is a
driver-side concern: a restart loop around ``StreamingQuery`` /
``foreachBatch`` bodies (SURVEY.md §2.1 R1) — tasks inside a batch ride
Spark's own task retry.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

DEFAULT_MAX_RETRIES = 10  # retry.clj:19


def backoff_seconds(attempt: int) -> int:
    """Cubic backoff, verbatim from retry.clj:11-17.

    0 -> 0 (first attempt runs immediately), then
    1 -> 5, 2 -> 10, 3 -> 25, 4 -> 65, 5 -> 125, ... capped nowhere.
    Clojure's ``round`` is round-half-up, matching Python here because
    attempt^3/5 has fractional part in {0, .2, .4, .6, .8}.
    """
    if attempt <= 0:
        return 0
    return max(5, 5 * round(attempt**3 / 5))


@dataclass
class RetryLoop:
    """Supervised call loop with the reference's retry policy.

    ``fn`` returns normally -> success, counter resets (retry.clj:24-40).
    ``fn`` raises: ``recoverable(exc)`` decides retry vs escalate; after
    ``max_retries`` consecutive failures the last exception is raised
    (retry.clj:42-58). ``prep`` (optional) re-establishes resources
    before each retry (retry.clj:93-113), e.g. rebuilding a writer —
    the reference uses it to swap in a fresh Kafka producer (K2).
    """

    fn: Callable[[], object]
    prep: Callable[[], None] | None = None
    recoverable: Callable[[BaseException], bool] = lambda e: True
    max_retries: int = DEFAULT_MAX_RETRIES
    sleep: Callable[[float], None] = time.sleep
    attempts: int = field(default=0, init=False)

    def run_once(self) -> object:
        """One supervised call, including any backoff owed from prior
        failures. Raises when retries are exhausted or unrecoverable."""
        while True:
            self.sleep(backoff_seconds(self.attempts))
            try:
                result = self.fn()
            except BaseException as exc:
                self.attempts += 1
                if not self.recoverable(exc) or self.attempts > self.max_retries:
                    raise
                if self.prep is not None:
                    self.prep()
                continue
            self.attempts = 0
            return result
