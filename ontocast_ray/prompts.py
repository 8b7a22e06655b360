"""Prompt templates for the LLM-backed extraction path.

Functionally equivalent re-expressions of the reference's prompt set
(/root/reference/ontocast/prompt/{select_ontology,render_ontology,
render_facts,criticise_ontology,criticise_facts}.py) — same inputs, same
contractual output shapes (Turtle graphs for render steps; JSON reports for
selector/critics, mirroring the Pydantic report models in ref
onto.py:423-528), with the reference's key behavioral requirements kept:
chunk-namespace ``cd:`` prefix for facts, typed xsd literals, atomic facts,
connected graphs, failure feedback re-injected on retries.
"""

SELECT_ONTOLOGY = """You match documents to ontologies.

Candidate ontologies:
{ontologies_desc}

Document excerpt:
```
{excerpt}
```

Reply with JSON only: {{"ontology_id": "<id or null>", "ontology_iri": "<iri or null>", "confidence": <0..1>}}.
Pick the single best-matching ontology, or null if none fits."""

RENDER_ONTOLOGY = """Extend the domain ontology with any classes and properties needed to
describe the document below, as Turtle.

{ontology_block}

Rules:
- new terms live in the ontology namespace <{ontology_namespace}>;
- every class gets rdfs:label (and rdfs:comment when inferable); every
  property gets rdf:Property typing plus rdfs:domain/rdfs:range when known;
- declare @prefix lines for every namespace you use;
- output ONLY the Turtle document.
{failure_instruction}

Document:
```
{text}
```"""

RENDER_FACTS = """Produce semantic triples for the concrete facts in the document below, as Turtle.

{ontology_block}

Rules:
- fact entities use the document namespace <{current_doc_namespace}> declared
  as `@prefix cd: <{current_doc_namespace}> .`;
- link every cd: entity to the domain ontology <{ontology_namespace}> or to
  base vocabularies (rdfs:Class, rdf:Property, schema:Person, ...);
- numbers/dates go into typed literals (xsd:integer, xsd:decimal, xsd:date),
  never left inside strings; keep facts atomic; tables via CSVW;
- the cd: subgraph must be connected;
- declare @prefix lines for every namespace used;
- output ONLY the Turtle document.
{failure_instruction}

Document:
```
{text}
```"""

CRITICISE_ONTOLOGY = """Review this ontology addendum for the document. Judge naming, typing,
domain/range completeness and redundancy against the base ontology.

Addendum:
```ttl
{addendum_ttl}
```

Reply with JSON only: {{"verdict": "pass"|"fail", "score": <0..1>, "comment": "<short reason>"}}."""

CRITICISE_FACTS = """Review these fact triples extracted from the document. Judge coverage,
atomicity, correct typing of literals and graph connectivity.

Facts:
```ttl
{facts_ttl}
```

Document:
```
{text}
```

Reply with JSON only: {{"verdict": "pass"|"fail", "score": <0..1>, "comment": "<short reason>"}}."""

FAILURE_FEEDBACK = """
A previous attempt failed at stage {stage}: {reason}
Fix that specific problem in this attempt."""
