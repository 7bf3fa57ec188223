# Replay the pipeline on synthetic test data (reference Makefile parity).
#
#   make data     generate a toy assembly + simulated Hi-C pairs
#   make pre      run instagraal-pre
#   make main     run the scaffolder (level 2, 3 cycles)
#   make polish   polish the scaffolds
#   make post     liftover + contact maps
#   make stats    compare draft vs scaffolded assembly
#   make all      everything above in order
#   make test     run the test suite
#   make native   build the C++ pairs scanner
#   make bench    run the one-line JSON benchmark

OUT := /tmp/instagraal_tpu_demo
FASTA := $(OUT)/toy.contigs.fa.gz
PAIRS := $(OUT)/toy.pairs.gz
LEVEL := 2
CYCLES := 3

.PHONY: all data pre main polish post stats test native bench clean

all: pre main polish post stats

data:
	mkdir -p $(OUT)
	python -c "from instagraal_tpu.testing import make_toy_genome, simulate_pairs; \
	  make_toy_genome('$(FASTA)'); \
	  simulate_pairs('$(FASTA)', '$(PAIRS)', n_pairs=200_000)"

pre: data
	instagraal-pre $(FASTA) $(PAIRS) -e DpnII -o $(OUT)/hic

main: pre
	instagraal $(OUT)/hic $(FASTA) -o $(OUT)/mcmc -l $(LEVEL) -n $(CYCLES) --bomb

polish: main
	instagraal-polish -i $(OUT)/mcmc/hic/test_mcmc_$(LEVEL)/info_frags.txt \
	  -f $(FASTA) -o $(OUT)/polish

post: polish
	instagraal-post $(PAIRS) $(OUT)/polish/new_info_frags.txt \
	  -o $(OUT)/post -r 10000

stats:
	instagraal-stats $(FASTA) $(OUT)/polish/polished_genome.fa -l draft,scaffolded

test:
	python -m pytest tests/ -q

# fast dev loop: skips the slow-marked virtual-mesh/yeast-scale tests
# (~43 min cold for test_device_sweep + test_parallel alone)
test-fast:
	python -m pytest tests/ -q -m "not slow"

native:
	g++ -O3 -shared -fPIC -std=c++17 instagraal_tpu/native/pairs_scan.cpp \
	  -lz -o instagraal_tpu/native/libpairs_scan.so

bench:
	python bench.py

clean:
	rm -rf $(OUT)
