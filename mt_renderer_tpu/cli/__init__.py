"""CLI tools (parity with the reference's src/bin/ binaries).

Run as ``python -m mt_renderer_tpu.cli.<tool>``.  Unlike the reference's
positional ``std::env::args()`` parsing, every tool has a real argparse
interface with ``--help``.
"""

import signal
import sys

# behave like a unix tool when piped into head etc.
if sys.platform != "win32":
    signal.signal(signal.SIGPIPE, signal.SIG_DFL)
