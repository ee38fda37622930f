"""Benchmark driver. Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: forward render throughput at 1080p on one chip (Mpix/s),
vs_baseline against the 60 Mpix/s interactive north star (BASELINE.md — the
reference publishes no numbers). Extra metrics go to stderr.
"""

from gaussian_splatting_web_tpu import bench_lib

if __name__ == "__main__":
    bench_lib.run()
