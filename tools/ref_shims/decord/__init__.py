"""Minimal decord shim: the reference only calls
decord.bridge.set_bridge('torch') and never touches it again (its dataset
reads PNG frames via PIL). decord is not installed in this environment."""


class _Bridge:
    @staticmethod
    def set_bridge(name):
        return None


bridge = _Bridge()
