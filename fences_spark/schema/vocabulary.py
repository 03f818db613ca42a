"""Draft 2020-12 ``$vocabulary`` policy (round-5 verdict item 4).

A schema's ``$schema`` names its meta-schema; the meta-schema's
``$vocabulary`` object maps vocabulary URIs to a required flag.  Per
the spec, an implementation that does not recognize a vocabulary
marked ``true`` MUST refuse to process schemas described by that
meta-schema — silently ignoring it could silently skip keywords the
author relies on.

Policy (pinned by tests/test_vocabulary.py):

- the engine only consults meta-schemas it can SEE: the standard
  draft-2020-12 meta-schema needs no lookup (its vocabularies are
  exactly the known set), and a CUSTOM meta-schema URI is resolved in
  the rule's ``resources`` registry;
- a resolvable meta-schema requiring a vocabulary outside the known
  draft-2020-12 set raises :class:`UnknownVocabularyError` at
  compile/``RuleSet.add`` time — loud, not a silent keyword drop;
- optional (``false``) unknown vocabularies are allowed, per spec;
- an UNRESOLVABLE ``$schema`` URI keeps the previous behavior —
  ignored as an annotation.  This mirrors the reference, which
  excludes the JSON-Schema-Test-Suite's vocabulary.json outright
  (scripts/jsts_corpus_ext.py:22-23 documents the same boundary); the
  difference is that when the user DOES hand us the meta-schema via
  ``resources``, we now honor its refusal semantics instead of
  ignoring them.
"""

from __future__ import annotations

from typing import Any

from fences_spark.compiler import CompileError

# The vocabularies of the draft 2020-12 dialect this engine
# implements (format-assertion included: `format` is enforced, not
# annotation-only — schema/evaluator.py format_regex).
KNOWN_VOCABULARIES = frozenset(
    {
        "https://json-schema.org/draft/2020-12/vocab/core",
        "https://json-schema.org/draft/2020-12/vocab/applicator",
        "https://json-schema.org/draft/2020-12/vocab/unevaluated",
        "https://json-schema.org/draft/2020-12/vocab/validation",
        "https://json-schema.org/draft/2020-12/vocab/meta-data",
        "https://json-schema.org/draft/2020-12/vocab/format-annotation",
        "https://json-schema.org/draft/2020-12/vocab/format-assertion",
        "https://json-schema.org/draft/2020-12/vocab/content",
    }
)


class UnknownVocabularyError(CompileError):
    """The schema's meta-schema requires a vocabulary this engine does
    not implement.  Subclasses :class:`CompileError` for callers that
    group compile failures, but is raised BEFORE tier selection — it
    must never be swallowed by the typed→Arrow fallback (no tier can
    honor an unknown vocabulary)."""


def check_vocabularies(schema: Any, resources: dict | None = None) -> None:
    """Raise :class:`UnknownVocabularyError` when ``schema``'s
    ``$schema`` resolves (via ``resources``) to a meta-schema whose
    ``$vocabulary`` requires a vocabulary outside
    :data:`KNOWN_VOCABULARIES`.  No-op for boolean schemas, absent /
    non-string ``$schema``, or an unresolvable meta-schema URI."""
    if not isinstance(schema, dict):
        return
    meta_uri = schema.get("$schema")
    if not isinstance(meta_uri, str):
        return
    meta = (resources or {}).get(meta_uri)
    if not isinstance(meta, dict):
        return  # standard or unresolvable meta-schema: nothing to refuse
    vocab = meta.get("$vocabulary")
    if not isinstance(vocab, dict):
        return
    unknown_required = sorted(
        uri
        for uri, required in vocab.items()
        if required is True and uri not in KNOWN_VOCABULARIES
    )
    if unknown_required:
        raise UnknownVocabularyError(
            f"meta-schema {meta_uri!r} requires unimplemented "
            f"vocabularies {unknown_required}; this engine implements the "
            "draft 2020-12 set only — remove the requirement (mark it "
            "false) or drop the custom meta-schema"
        )
