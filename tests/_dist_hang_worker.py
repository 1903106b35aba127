"""Worker that never rendezvouses — forces the _spawn_dist_workers
timeout path so the skip-vs-fail behavior is unit-testable."""
import time

if __name__ == "__main__":
    time.sleep(300)
