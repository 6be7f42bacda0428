#!/usr/bin/env python
"""Checkout shim preserving the reference's ``python eval.py ...`` invocation
contract. The implementation lives in the packaged module
``anomalyclip_tpu.eval_entry``."""

from anomalyclip_tpu.eval_entry import cli, main  # noqa: F401

if __name__ == "__main__":
    main()
