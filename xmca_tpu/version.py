"""Package version, git-derived when building from a checkout.

Parity with the reference's setuptools-git-versioning setup
(/root/reference/setup.py:34-40: ``{tag}.post{ccount}`` templates over a
version callback): a git checkout reports ``<base>.post<commits>`` via
``git describe``-style commit counting; source distributions and
environments without git fall back to the pinned base version.
"""
import os
import subprocess

_BASE_VERSION = '0.1.0'


def _git_version(base):
    """``<base>.post<ccount>`` from the enclosing git checkout, or None."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.isdir(os.path.join(repo, '.git')):
        return None
    try:
        out = subprocess.run(
            ['git', 'rev-list', '--count', 'HEAD'], cwd=repo,
            capture_output=True, text=True, timeout=5,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    if out.returncode != 0:
        return None
    ccount = out.stdout.strip()
    if not ccount.isdigit():
        return None
    return '{:}.post{:}'.format(base, ccount)


__version__ = _git_version(_BASE_VERSION) or _BASE_VERSION
