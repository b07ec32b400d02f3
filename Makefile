# Common entry points (see docs/STATUS.md for the round summary).

.PHONY: test bench train-synth eval profile parity

test:
	python -m pytest tests/ -q

bench:            ## one-chip serving throughput (real TPU)
	python bench.py

train-synth:      ## smoke-train the flagship on synthetic data
	python -m probpose_pytorch_tpu.train.cli runs/synth --dataset-format synthetic --max-steps 200

profile:          ## component-level timing on the chip
	python scripts/profile_bench.py

parity:           ## on-hardware decode-parity checks
	python scripts/verify_decode_tpu.py && python scripts/parity_sweep.py
