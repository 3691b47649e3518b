"""Sources & sinks.

wire.py   Kafka wire-record shape (key/value/topic string columns)
files.py  file-based DML JSON source (batch + stream) — the test
          stand-in for the reference's Oracle AQ listener (S3)
kafka.py  Kafka batch snapshot / stream tail / routed sink (S1/S2/K1)
          — requires the spark-sql-kafka package on the classpath;
          guarded, since the test container has no broker or jar
"""
