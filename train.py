#!/usr/bin/env python
"""Checkout shim preserving the reference's ``python train.py ...`` invocation
contract. The implementation lives in the packaged module
``anomalyclip_tpu.train_entry`` (so installed environments never gain a
top-level ``train`` module that could shadow other projects')."""

from anomalyclip_tpu.train_entry import cli, main  # noqa: F401

if __name__ == "__main__":
    main()
