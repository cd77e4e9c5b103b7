"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) — the
extension point for sources Spark has no built-in reader for.

`mura_synth` is a deterministic synthetic-corpus generator: N rows in S
stripes, each `InputPartition` generating its stripe locally on its
executor — zero input I/O, which is exactly how a 1000-executor cluster
smoke-tests its pipeline wiring without reading 100 TB (the same role
Spark's built-in `range()` plays, demonstrated here through the public
plugin API with a derived deterministic payload). The row function is
pure integer arithmetic (Knuth multiplicative hash modulo a prime) so an
oracle can regenerate the identical table from `range()`.

No reference analog (the reference reads Parquet only —
/root/reference/src/parser/mod.rs:21-24); extension beside the
format scanners in sources/text_formats.py.

Scale notes: `partitions()` is driver-side planning metadata (S stripe
descriptors, no data); each `read()` streams its stripe as generated
tuples through Arrow batches. Stripe width = ceil(N/S) rows — size S so
stripes fit executor memory, the same rule as file-split sizing.
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

#: Knuth's 2^32 multiplicative hash constant and a prime modulus — both
#: small enough that id·K stays far below 2^63 for any plausible N.
_K = 2654435761
_P = 997


def synth_value(i: int) -> int:
    """The deterministic payload: (i·K) mod P, exact in int64 for
    i < 3.5e9; the oracle SQL re-derives it from range()."""
    return (i * _K) % _P


class SynthReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.shards = int(options.get("shards", 8))

    def partitions(self):
        return [InputPartition(s) for s in range(self.shards)]

    def read(self, partition):
        s = partition.value
        for i in range(s, self.n, self.shards):
            yield (i, s, synth_value(i))


class SynthDataSource(DataSource):
    @classmethod
    def name(cls):
        return "mura_synth"

    def schema(self):
        return "id bigint, shard int, value bigint"

    def reader(self, schema):
        return SynthReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the mura_synth format."""
    spark.dataSource.register(SynthDataSource)
