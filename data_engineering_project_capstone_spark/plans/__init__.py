from .flagship import flagship_q1, flagship_q2, flagship_q3

__all__ = ["flagship_q1", "flagship_q2", "flagship_q3"]
