#!/usr/bin/env python
"""Reference-compatible CLI shim: python main.py --env pong [flags...]
(same flag surface as reference main.py:25-51)."""

from scmgan_tpu.cli.main import main

if __name__ == "__main__":
    main()
