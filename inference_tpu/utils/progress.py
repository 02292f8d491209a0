"""Progress reporting for long-running sampling loops.

User-facing behaviour mirrors the reference ``ChainProgressPrinter``
(reference: inference/mcmc/utilities.py:8-80): single-line ``\\r`` status
updates with percent/ETA, iteration counts, or countdowns, all disabled via
``display_progress=False``.
"""

import sys
from time import time


class ChainProgressPrinter:
    def __init__(self, display: bool = True, leading_msg: str = None):
        self.lead = "" if leading_msg is None else leading_msg

        if not display:
            self.iterations_initial = self._silent
            self.iterations_progress = self._silent
            self.iterations_final = self._silent
            self.percent_progress = self._silent
            self.percent_final = self._silent
            self.countdown_progress = self._silent
            self.countdown_final = self._silent

    def iterations_initial(self, total_itr: int):
        sys.stdout.write("\n")
        sys.stdout.write(f"\r  {self.lead}   [ 0 / {total_itr} iterations completed ]")
        sys.stdout.flush()

    def iterations_progress(self, t_start: float, current_itr: int, total_itr: int):
        dt = time() - t_start
        eta = int(dt * (total_itr / (current_itr + 1) - 1))
        sys.stdout.write(
            f"\r  {self.lead}   [ {current_itr + 1} / {total_itr} iterations "
            f"completed  |  ETA: {eta} sec ]"
        )
        sys.stdout.flush()

    def iterations_final(self, total_itr: int):
        sys.stdout.write(
            f"\r  {self.lead}   [ {total_itr} / {total_itr} iterations completed ]"
            "                  \n"
        )
        sys.stdout.flush()

    def percent_progress(self, t_start: float, current_itr: int, total_itr: int):
        dt = time() - t_start
        pct = int(100 * (current_itr + 1) / total_itr)
        eta = int(dt * (total_itr / (current_itr + 1) - 1))
        sys.stdout.write(
            f"\r  {self.lead}   [ {pct}% complete  |  ETA: {eta} sec ]    "
        )
        sys.stdout.flush()

    def percent_final(self, t_start: float, total_itr: int):
        t_elapsed = int(time() - t_start)
        mins, secs = divmod(t_elapsed, 60)
        hrs, mins = divmod(mins, 60)
        sys.stdout.write(
            f"\r  {self.lead}   [ complete - {total_itr} steps taken in "
            f"{hrs}:{mins:02d}:{secs:02d} ]      \n"
        )
        sys.stdout.flush()

    def countdown_progress(self, t_end, steps_taken):
        seconds_remaining = int(t_end - time())
        mins, secs = divmod(seconds_remaining, 60)
        hrs, mins = divmod(mins, 60)
        sys.stdout.write(
            f"\r  {self.lead}   [ {steps_taken} steps taken, time remaining: "
            f"{hrs}:{mins:02d}:{secs:02d} ]    "
        )
        sys.stdout.flush()

    def countdown_final(self, run_time, steps_taken):
        mins, secs = divmod(int(run_time), 60)
        hrs, mins = divmod(mins, 60)
        sys.stdout.write(
            f"\r  {self.lead}   [ complete - {steps_taken} steps taken in "
            f"{hrs}:{mins:02d}:{secs:02d} ]      \n"
        )
        sys.stdout.flush()

    @staticmethod
    def _silent(*args, **kwargs):
        pass
