# Equivalent of /root/reference/Makefile (build-cli-docker), extended
# with the node image and the local dev loop.
export CLI_NAME=aligner-cli
export NODE_NAME=aligner-node
export BRANCH=$(shell git symbolic-ref --short HEAD 2>/dev/null || echo dev)

.PHONY: build-cli-docker build-node-docker install test bench

build-cli-docker:
	docker build -t ${CLI_NAME}:${BRANCH} -f Dockerfile.cli .

build-node-docker:
	docker build -t ${NODE_NAME}:${BRANCH} -f Dockerfile.node .

install:
	pip install -e . --no-build-isolation

test:
	python -m pytest tests/ -q

bench:
	python bench.py
