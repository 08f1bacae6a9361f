"""Engine-wide tuning knobs.

``NUM_BUCKETS`` is the fan-out of every keyed coarse-bucket stage
(sessionization, rolling windows, group-concat assembly, LSH pair
generation, label propagation). One knob so a larger cluster raises
in-shuffle parallelism everywhere at once.

On a real cluster set this to ~2-4x the total worker count. It is a
CONSTANT here (not derived from ``num_cpus``) on purpose: benchmark
methodology requires the execution plan to be identical at every
parallelism level, and a bucket count that follows the CPU count would
silently change the plan between scaling runs (see BASELINE.md).
"""

NUM_BUCKETS = 64
