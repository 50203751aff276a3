"""The leak/copy guard (tools/guard.py) must pass on the repo as-is AND
actually catch each violation class on synthetic offender files."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools import guard


def test_repo_is_clean():
    errors = []
    for p in guard.first_party_files():
        errors.extend(guard.check_file(p))
    assert errors == []


def _errs(tmp_path, src: str):
    f = tmp_path / "offender.py"
    f.write_text(src)
    return guard.check_file(str(f))


def test_catches_nonallowlisted_import(tmp_path):
    errs = _errs(tmp_path, "import requests\n")
    assert any("non-allowlisted import 'requests'" in e for e in errs)


def test_catches_reference_token_in_code_not_docstring(tmp_path):
    clean = _errs(tmp_path,
                  '"""Parity with ContractOrchestrator (main.py:12)."""\n'
                  "x = 1\n")
    assert clean == []
    dirty = _errs(tmp_path, "class ContractOrchestrator:\n    pass\n")
    assert any("reference-distinctive token" in e for e in dirty)


def test_comment_citation_allowed(tmp_path):
    assert _errs(tmp_path, "x = 1  # mirrors FormFiller.fill\n") == []


def test_catches_bucket_url_and_env(tmp_path):
    errs = _errs(tmp_path,
                 "p = 's3://some-bucket/data'\n"
                 "import os\n"
                 "k = os.environ.get('SECRET_API_KEY')\n")
    assert any("suspicious string" in e for e in errs)
    assert any("non-allowlisted env var 'SECRET_API_KEY'" in e
               for e in errs)


def test_example_domains_allowed(tmp_path):
    assert _errs(tmp_path, "m = 'a@example-corp.com'\n") == []


def test_catches_env_subscript_and_getenv(tmp_path):
    errs = _errs(tmp_path,
                 "import os\n"
                 "a = os.environ['INTERNAL_API_KEY']\n"
                 "b = os.getenv('GEMINI_KEY')\n")
    assert any("'INTERNAL_API_KEY'" in e for e in errs)
    assert any("'GEMINI_KEY'" in e for e in errs)


def test_catches_bare_getenv_and_environ(tmp_path):
    # `from os import getenv, environ` drops the os. prefix the old regex
    # keyed on (ADVICE r6); the bare spellings must be caught too
    errs = _errs(tmp_path,
                 "from os import getenv, environ\n"
                 "a = getenv('SECRET_TOKEN')\n"
                 "b = environ['VAULT_ADDR']\n")
    assert any("'SECRET_TOKEN'" in e for e in errs)
    assert any("'VAULT_ADDR'" in e for e in errs)
    # ...but attribute access on unrelated objects is NOT an env read
    # (request.environ is WSGI, h.getenv is any API): no false positives
    clean = _errs(tmp_path,
                  "def f(request, h):\n"
                  "    a = request.environ['REMOTE_ADDR']\n"
                  "    return h.getenv('SOME_NAME')\n")
    assert clean == []
    # ...including identifiers/attribute chains that merely END in "os"
    # (ADVICE r7: the boundary must cover the os.-prefixed branch too)
    clean2 = _errs(tmp_path,
                   "def g(myos, chaos):\n"
                   "    a = myos.environ['SECRET_X']\n"
                   "    return chaos.getenv('TOKEN_X')\n")
    assert clean2 == []


def test_catches_dot_preceded_os_chain(tmp_path):
    # ADVICE r8: the blanket lookbehind that fixed myos/chaos also
    # suppressed genuine env reads through attribute chains ENDING in the
    # os module -- those must still flag.
    errs = _errs(tmp_path,
                 "import os as _os\n"
                 "class C:\n"
                 "    os = _os\n"
                 "    def f(self, mod):\n"
                 "        a = mod.os.environ['SECRET_Y']\n"
                 "        return self.os.getenv('TOKEN_Y')\n")
    assert any("SECRET_Y" in e for e in errs)
    assert any("TOKEN_Y" in e for e in errs)


def test_catches_google_submodule_beyond_protobuf(tmp_path):
    ok = _errs(tmp_path, "from google.protobuf import message\n")
    assert ok == []
    errs = _errs(tmp_path, "import google.generativeai\n")
    assert any("google submodule" in e for e in errs)


def test_reference_token_in_string_after_hash_still_caught(tmp_path):
    # a '#' INSIDE a string must not truncate the scanned code line
    errs = _errs(tmp_path,
                 "p = 'based on # ContractOrchestrator.run'\n")
    assert any("reference-distinctive token" in e for e in errs)
