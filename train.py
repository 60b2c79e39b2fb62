#!/usr/bin/env python
"""Single training entry point: python train.py --model gcn --dataset cora"""

from graphneuralnetwork_tpu.cli import main

if __name__ == "__main__":
    main()
