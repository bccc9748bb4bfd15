"""Leveled logging printer (reference: pygsti/baseobjs/verbosityprinter.py:77).

Single-controller JAX has no MPI ranks; process-0 filtering uses
``jax.process_index()`` when jax is initialized, else prints always.
"""

from __future__ import annotations

import sys


class VerbosityPrinter(object):
    """Prints messages at or below the configured verbosity level."""

    def __init__(self, verbosity=1, filename=None, process_zero_only=True):
        self.verbosity = verbosity if verbosity is not None else 1
        self.filename = filename
        self.process_zero_only = process_zero_only
        self._progress_stack = []
        self.recorded_output = None

    @classmethod
    def create_printer(cls, verbosity):
        if isinstance(verbosity, VerbosityPrinter):
            return verbosity
        return cls(verbosity)

    def _is_process_zero(self):
        if not self.process_zero_only:
            return True
        try:
            import jax
            return jax.process_index() == 0
        except Exception:
            return True

    def _emit(self, msg):
        if not self._is_process_zero():
            return
        if self.recorded_output is not None:
            self.recorded_output.append(msg)
        if self.filename:
            with open(self.filename, 'a') as f:
                f.write(msg + "\n")
        else:
            print(msg, file=sys.stdout)
            sys.stdout.flush()

    def log(self, message, message_level=1, indent_offset=0):
        if message_level <= self.verbosity:
            indent = '  ' * (len(self._progress_stack) + indent_offset)
            self._emit(indent + str(message))

    def warning(self, message):
        self._emit("WARNING: %s" % message)

    def error(self, message):
        self._emit("ERROR: %s" % message)

    def start_recording(self):
        self.recorded_output = []

    def stop_recording(self):
        rec, self.recorded_output = self.recorded_output, None
        return rec

    def progress_logging(self, message_level=1):
        printer = self

        class _Ctx:
            def __enter__(self_inner):
                printer._progress_stack.append(message_level)
                return printer

            def __exit__(self_inner, *exc):
                printer._progress_stack.pop()
                return False

        return _Ctx()

    def show_progress(self, iteration, total, prefix='', suffix='', bar_length=50):
        level = self._progress_stack[-1] if self._progress_stack else 1
        if level <= self.verbosity:
            self.log("%s %d/%d %s" % (prefix, iteration + 1, total, suffix), level, -1)

    def __add__(self, n):
        p = VerbosityPrinter(self.verbosity + n, self.filename, self.process_zero_only)
        p._progress_stack = self._progress_stack
        return p

    def __sub__(self, n):
        return self.__add__(-n)
