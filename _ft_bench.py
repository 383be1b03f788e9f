import sys
sys.argv = ["x"]
from benchmarks.run_all import bench_finetune_step
bench_finetune_step(batch_sizes=(8, 16, 32))
