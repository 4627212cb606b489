"""Ray Data stages: batch-transform callables used with ``Dataset.map_batches``.

Stateless pure-CPU stages are plain functions (elastic Ray tasks);
stages holding warm state (compiled regex tables, gazetteers, permutation
matrices) are callable classes run as actor pools
(``map_batches(Cls, concurrency=N)``) — state built once per actor in
``__init__``, per-batch work in ``__call__``.
"""
