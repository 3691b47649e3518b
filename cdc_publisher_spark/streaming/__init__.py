"""Structured-streaming layer.

pipeline.py            the reference's data plane: DML raw -> envelope
                       -> key -> wire record -> routed sink (§3.3)
latest_state_stream.py A1 streaming latest-per-key (stateful)
routes.py              D1 dynamic fan-out control loop (driver-side)
metrics.py             M1 observability (observe + query listener)
"""
