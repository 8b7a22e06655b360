"""Entity/predicate disambiguation + canonical URI minting (the aggregation core).

Rule-for-rule port of the reference's ``ChunkRDFGraphAggregator`` /
``EntityDisambiguator`` (/root/reference/ontocast/tool/aggregate.py:44-764),
operating on our TripleGraph. The reference semantics that MUST hold (and are
gated by goldens):

- per-document scope; chunks processed in chunk order (the greedy grouping is
  insertion-order dependent — ref aggregate.py:484-559);
- namespace union with ``{prefix}_{n}`` rename on collision (:91-104);
- entity metadata: labels/comments from rdfs:label/rdfs:comment, local name
  from ``derive_ontology_id`` (:444-482); predicate metadata incl.
  domain/range/explicit-Property (:648-690), longer-value-wins merge
  (:147-172);
- greedy similarity groups: type-conflict guard, exact case-insensitive
  local-name match first, else label fuzz.ratio ≥ 90 (shared types) / 85
  (:484-559); predicates require domain/range compatibility (:692-764);
- canonical IRI = doc_namespace + clean_local_name(best member's local name),
  best = longest label (entities, :561-592) / most metadata fields
  (predicates, :594-633), with ``_{counter}`` suffix on collision (:188-222);
- canonical metadata triples: best(longest) label, union of types, merged
  predicate info — doc-namespace predicates only (:275-362);
- chunk triples re-emitted with mappings applied, skipping triples whose
  subject == chunk IRI (:246-259); provenance ``chunk a prov:Entity``,
  ``chunk prov:wasPartOf doc`` (:239-243) and ``entity prov:wasGeneratedBy
  chunk`` for doc-namespace subjects (:262-265).

At cross-document scale the same rules run as a two-level shuffle (see
``ontocast_ray.pipelines.kg``): this per-doc kernel is invoked from
``groupby("doc_id").map_groups``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

from ontocast_ray.functions.fuzz import ratio_at_least
from ontocast_ray.functions.uris import clean_local_name, derive_ontology_id, iri2namespace
from ontocast_ray.rdf.graph import TripleGraph
from ontocast_ray.rdf.namespaces import PROV, RDF, RDFS
from ontocast_ray.rdf.terms import Literal, URI


@dataclass
class EntityMetadata:
    local_name: str
    label: Optional[str] = None
    comment: Optional[str] = None
    types: Set[URI] = field(default_factory=set)


@dataclass
class PredicateMetadata:
    local_name: str
    label: Optional[str] = None
    comment: Optional[str] = None
    domain: Optional[URI] = None
    range: Optional[URI] = None
    is_explicit_property: bool = False


@dataclass
class ChunkGraph:
    """Minimal stand-in for the reference ``Chunk`` (ref onto.py:846-886)."""

    hid: str
    doc_iri: str
    graph: TripleGraph

    @property
    def iri(self) -> str:
        return f"{self.doc_iri}/chunk/{self.hid}"

    @property
    def namespace(self) -> str:
        return iri2namespace(self.iri, ontology=False)

    def sanitize(self) -> None:
        """ref onto.py:884-886: unbind /chunk/ prefixes + dedupe prefix map."""
        self.graph = self.graph.unbind_chunk_namespaces()
        self.graph.sanitize_prefixes_namespaces()


class EntityDisambiguator:
    """ref aggregate.py:401-764."""

    def __init__(self, similarity_threshold: float = 85.0, semantic_threshold: float = 90.0):
        self.similarity_threshold = similarity_threshold
        self.semantic_threshold = semantic_threshold

    def normalize_uri(self, uri, namespaces: Dict[str, str], _memo: Optional[dict] = None) -> Tuple[str, str]:
        """Expand prefixed form; local name via derive_ontology_id (ref :427-442)."""
        uri_str = str(uri)
        if _memo is not None:
            hit = _memo.get(uri_str)
            if hit is not None:
                return hit
        for prefix, namespace in namespaces.items():
            if uri_str.startswith(f"{prefix}:"):
                full_uri = uri_str.replace(f"{prefix}:", str(namespace))
                out = (full_uri, derive_ontology_id(full_uri))
                if _memo is not None:
                    _memo[uri_str] = out
                return out
        out = (uri_str, derive_ontology_id(uri_str))
        if _memo is not None:
            _memo[uri_str] = out
        return out

    def _norm_term(self, term: URI, namespaces: Dict[str, str], memo: dict):
        """Memoized (normalized URI object, local name). When no prefix form
        matches (the common case — our pipeline stores expanded URIs), the
        original term object is reused instead of allocating an equal one."""
        hit = memo.get(term)
        if hit is not None:
            return hit
        full_uri, local_name = self.normalize_uri(term, namespaces)
        uri_ref = term if full_uri == str(term) else URI(full_uri)
        out = (uri_ref, local_name)
        memo[term] = out
        return out

    def extract_entity_labels(self, graph: TripleGraph) -> Dict[URI, EntityMetadata]:
        """ref :444-482 — two passes: labeled entities first, then all URIs."""
        labels: Dict[URI, EntityMetadata] = {}
        namespaces = dict(graph.namespaces())
        memo: dict = {}

        for subj, pred, obj in graph:
            if (
                (pred == RDFS.label or pred == RDFS.comment)
                and isinstance(obj, Literal)
                and isinstance(subj, URI)
            ):
                uri_ref, local_name = self._norm_term(subj, namespaces, memo)
                if uri_ref not in labels:
                    labels[uri_ref] = EntityMetadata(local_name=local_name)
                if pred == RDFS.label:
                    labels[uri_ref].label = str(obj)
                elif pred == RDFS.comment:
                    labels[uri_ref].comment = str(obj)

        for subj, pred, obj in graph:
            for entity in (subj, obj):
                if isinstance(entity, URI):
                    uri_ref, local_name = self._norm_term(entity, namespaces, memo)
                    if uri_ref not in labels:
                        labels[uri_ref] = EntityMetadata(local_name=local_name)
        return labels

    def extract_predicate_info(self, graph: TripleGraph) -> Dict[URI, PredicateMetadata]:
        """ref :648-690."""
        predicate_info: Dict[URI, PredicateMetadata] = {}
        namespaces = dict(graph.namespaces())
        memo: dict = {}

        for _, pred, _ in graph:
            if isinstance(pred, URI):
                uri_ref, local_name = self._norm_term(pred, namespaces, memo)
                if uri_ref not in predicate_info:
                    predicate_info[uri_ref] = PredicateMetadata(local_name=local_name)

        for subj, pred, obj in graph:
            if isinstance(subj, URI):
                norm_subj, _ = self._norm_term(subj, namespaces, memo)
                if pred == RDF.type and obj == RDF.Property:
                    if norm_subj in predicate_info:
                        predicate_info[norm_subj].is_explicit_property = True
                elif (pred == RDFS.label or pred == RDFS.comment) and isinstance(obj, Literal):
                    if norm_subj in predicate_info:
                        if pred == RDFS.label:
                            predicate_info[norm_subj].label = str(obj)
                        else:
                            predicate_info[norm_subj].comment = str(obj)
                elif pred == RDFS.domain and norm_subj in predicate_info:
                    predicate_info[norm_subj].domain = obj
                elif pred == RDFS.range and norm_subj in predicate_info:
                    predicate_info[norm_subj].range = obj
        return predicate_info

    def find_similar_entities(
        self,
        entities_with_labels: Dict[URI, EntityMetadata],
        entity_types: Optional[Dict[URI, Set[URI]]] = None,
    ) -> List[List[URI]]:
        """Greedy single-pass grouping (ref :484-559)."""
        if entity_types is None:
            entity_types = {}
        entity_groups: List[List[URI]] = []
        processed: set = set()
        entities_list = list(entities_with_labels.keys())

        for i, entity1 in enumerate(entities_list):
            if entity1 in processed:
                continue
            similar_group = [entity1]
            info1 = entities_with_labels[entity1]
            types1 = entity_types.get(entity1, set())
            processed.add(entity1)

            for entity2 in entities_list[i + 1:]:
                if entity2 in processed:
                    continue
                info2 = entities_with_labels[entity2]
                types2 = entity_types.get(entity2, set())

                type_compatible = (
                    not types1 or not types2 or bool(types1.intersection(types2))
                )
                if not type_compatible:
                    continue

                if info1.local_name.lower() == info2.local_name.lower():
                    similar_group.append(entity2)
                    processed.add(entity2)
                    continue

                label1 = info1.label.lower() if info1.label is not None else ""
                label2 = info2.label.lower() if info2.label is not None else ""
                if label1 and label2:
                    threshold = (
                        self.semantic_threshold
                        if types1.intersection(types2)
                        else self.similarity_threshold
                    )
                    if ratio_at_least(label1, label2, threshold):
                        similar_group.append(entity2)
                        processed.add(entity2)

            if len(similar_group) > 1:
                entity_groups.append(similar_group)
        return entity_groups

    def find_similar_predicates(
        self, predicates_with_info: Dict[URI, PredicateMetadata]
    ) -> List[List[URI]]:
        """ref :692-751."""
        predicate_groups: List[List[URI]] = []
        processed: set = set()
        predicates_list = list(predicates_with_info.keys())

        for i, pred_a in enumerate(predicates_list):
            if pred_a in processed:
                continue
            similar_group = [pred_a]
            info1 = predicates_with_info[pred_a]
            processed.add(pred_a)

            for pred_b in predicates_list[i + 1:]:
                if pred_b in processed:
                    continue
                info2 = predicates_with_info[pred_b]

                if info1.local_name.lower() == info2.local_name.lower():
                    if self._check_domain_range_compatibility(info1, info2):
                        similar_group.append(pred_b)
                        processed.add(pred_b)
                    continue

                if info1.label is not None and info2.label is not None:
                    if ratio_at_least(
                        info1.label.lower(), info2.label.lower(), self.similarity_threshold
                    ) and self._check_domain_range_compatibility(info1, info2):
                        similar_group.append(pred_b)
                        processed.add(pred_b)

            if len(similar_group) > 1:
                predicate_groups.append(similar_group)
        return predicate_groups

    def _check_domain_range_compatibility(
        self, info1: PredicateMetadata, info2: PredicateMetadata
    ) -> bool:
        """Equal-or-either-None on both domain and range (ref :753-764)."""
        domain_compatible = (
            info1.domain == info2.domain or info1.domain is None or info2.domain is None
        )
        range_compatible = (
            info1.range == info2.range or info1.range is None or info2.range is None
        )
        return domain_compatible and range_compatible

    def create_canonical_iri(
        self,
        similar_entities: List[URI],
        doc_namespace: str,
        entity_labels: Dict[URI, EntityMetadata],
    ) -> URI:
        """Longest-label member wins; mint in doc namespace (ref :561-592)."""
        best_entity = max(
            similar_entities,
            key=lambda e: len(entity_labels.get(e, EntityMetadata(local_name="")).label or ""),
        )
        best_info = entity_labels.get(
            best_entity, EntityMetadata(local_name=derive_ontology_id(str(best_entity)))
        )
        return URI(f"{doc_namespace}{clean_local_name(best_info.local_name)}")

    def create_canonical_predicate(
        self,
        similar_predicates: List[URI],
        doc_namespace: str,
        predicate_info: Dict[URI, PredicateMetadata],
    ) -> URI:
        """Most-metadata member wins (ref :594-633)."""
        best_pred = max(
            similar_predicates,
            key=lambda p: sum(
                1
                for v in [
                    predicate_info.get(p, PredicateMetadata(local_name="")).label,
                    predicate_info.get(p, PredicateMetadata(local_name="")).comment,
                    predicate_info.get(p, PredicateMetadata(local_name="")).domain,
                    predicate_info.get(p, PredicateMetadata(local_name="")).range,
                ]
                if v is not None
            ),
        )
        best_info = predicate_info.get(
            best_pred, PredicateMetadata(local_name=derive_ontology_id(str(best_pred)))
        )
        return URI(f"{doc_namespace}{clean_local_name(best_info.local_name)}")


class ChunkGraphAggregator:
    """ref aggregate.py:44-398 — aggregate chunk graphs into one doc graph."""

    def __init__(self, similarity_threshold: float = 85.0, semantic_threshold: float = 90.0):
        self.disambiguator = EntityDisambiguator(similarity_threshold, semantic_threshold)

    def aggregate_graphs(self, chunks: List[ChunkGraph], doc_namespace: str) -> TripleGraph:
        aggregated_graph = TripleGraph()

        if not doc_namespace.endswith(("/", "#")):
            doc_namespace = doc_namespace + "/"

        # Namespace union with collision rename {prefix}_{n} (ref :91-104)
        all_namespaces: Dict[str, str] = {}
        for chunk in chunks:
            for prefix, uri in chunk.graph.namespaces():
                if prefix not in all_namespaces:
                    all_namespaces[prefix] = uri
                elif all_namespaces[prefix] != uri:
                    new_prefix = f"{prefix}_{len(all_namespaces)}"
                    all_namespaces[new_prefix] = uri
        for prefix, uri in all_namespaces.items():
            aggregated_graph.bind(prefix, uri)
        aggregated_graph.bind("prov", str(PROV))
        aggregated_graph.bind("cd", doc_namespace)

        # First pass: collect entities/predicates/types across chunks (ref :113-172)
        all_entities_with_labels: Dict[URI, EntityMetadata] = {}
        all_predicates_with_info: Dict[URI, PredicateMetadata] = {}
        entity_types: Dict[URI, Set[URI]] = {}

        for chunk in chunks:
            entities_labels = self.disambiguator.extract_entity_labels(chunk.graph)
            all_entities_with_labels.update(entities_labels)

            for subj, pred, obj in chunk.graph:
                if pred == RDF.type and isinstance(subj, URI) and isinstance(obj, URI):
                    entity_types.setdefault(subj, set()).add(obj)

            predicates_info = self.disambiguator.extract_predicate_info(chunk.graph)
            for pred, info in predicates_info.items():
                if pred not in all_predicates_with_info:
                    all_predicates_with_info[pred] = info
                else:
                    existing_info = all_predicates_with_info[pred]
                    for key in ("label", "comment", "domain", "range"):
                        new_val = getattr(info, key)
                        cur_val = getattr(existing_info, key)
                        if cur_val is None and new_val is not None:
                            setattr(existing_info, key, new_val)
                        elif (
                            cur_val is not None
                            and new_val is not None
                            and isinstance(new_val, str)
                            and len(str(new_val)) > len(str(cur_val))
                        ):
                            setattr(existing_info, key, new_val)
                    if info.is_explicit_property:
                        existing_info.is_explicit_property = True

        similar_entity_groups = self.disambiguator.find_similar_entities(
            all_entities_with_labels, entity_types
        )
        similar_predicate_groups = self.disambiguator.find_similar_predicates(
            all_predicates_with_info
        )

        # Canonical mappings with _{counter} uniqueness (ref :184-222)
        entity_mapping: Dict[URI, URI] = {}
        canonical_entities: set = set()
        for group in similar_entity_groups:
            canonical_uri = self.disambiguator.create_canonical_iri(
                group, doc_namespace, all_entities_with_labels
            )
            base_canonical = canonical_uri
            counter = 1
            while canonical_uri in canonical_entities:
                local_name = str(base_canonical).split(doc_namespace)[-1]
                canonical_uri = URI(f"{doc_namespace}{local_name}_{counter}")
                counter += 1
            canonical_entities.add(canonical_uri)
            for entity in group:
                entity_mapping[entity] = canonical_uri

        predicate_mapping: Dict[URI, URI] = {}
        canonical_predicates: set = set()
        for group in similar_predicate_groups:
            canonical_uri = self.disambiguator.create_canonical_predicate(
                group, doc_namespace, all_predicates_with_info
            )
            base_canonical = canonical_uri
            counter = 1
            while canonical_uri in canonical_predicates:
                local_name = str(base_canonical).split(doc_namespace)[-1]
                canonical_uri = URI(f"{doc_namespace}{local_name}_{counter}")
                counter += 1
            canonical_predicates.add(canonical_uri)
            for predicate in group:
                predicate_mapping[predicate] = canonical_uri

        self._add_canonical_metadata(
            aggregated_graph,
            doc_namespace,
            entity_mapping,
            predicate_mapping,
            all_entities_with_labels,
            all_predicates_with_info,
            entity_types,
        )

        # Re-emit chunk triples with mappings + provenance (ref :234-265)
        for chunk in chunks:
            chunk_iri = URI(chunk.iri)
            aggregated_graph.add((chunk_iri, RDF.type, PROV.Entity))
            aggregated_graph.add(
                (chunk_iri, PROV.wasPartOf, URI(doc_namespace.rstrip("#/")))
            )
            for subj, pred, obj in chunk.graph:
                if subj == chunk_iri:
                    continue
                new_subj = entity_mapping.get(subj, subj)
                new_pred = predicate_mapping.get(pred, pred)
                new_obj = entity_mapping.get(obj, obj) if isinstance(obj, URI) else obj
                aggregated_graph.add((new_subj, new_pred, new_obj))
                if isinstance(new_subj, URI) and str(new_subj).startswith(doc_namespace):
                    aggregated_graph.add((new_subj, PROV.wasGeneratedBy, chunk_iri))

        return aggregated_graph

    def _add_canonical_metadata(
        self,
        graph: TripleGraph,
        doc_namespace: str,
        entity_mapping: Dict[URI, URI],
        predicate_mapping: Dict[URI, URI],
        entity_labels: Dict[URI, EntityMetadata],
        predicate_info: Dict[URI, PredicateMetadata],
        entity_types: Dict[URI, Set[URI]],
    ) -> None:
        """ref :275-362. ``doc_namespace`` replaces the 'cd'-binding lookup."""
        canonical_to_originals: Dict[URI, List[URI]] = {}
        for original, canonical in entity_mapping.items():
            canonical_to_originals.setdefault(canonical, []).append(original)

        for canonical, originals in canonical_to_originals.items():
            best_label = self._get_best_label([entity_labels.get(o) for o in originals])
            if best_label:
                graph.add((canonical, RDFS.label, Literal(best_label)))
            all_types: Set[URI] = set()
            for orig in originals:
                all_types.update(entity_types.get(orig, set()))
            for type_uri in sorted(all_types):  # deterministic emit order
                graph.add((canonical, RDF.type, type_uri))

        processed_entities = set(entity_mapping.keys())
        # ref :309 unions two dict key-sets; preserve insertion order instead
        all_entities: Dict[URI, None] = {}
        for e in entity_labels:
            all_entities.setdefault(e, None)
        for e in entity_types:
            all_entities.setdefault(e, None)

        for entity in all_entities:
            if entity not in processed_entities:
                meta = entity_labels.get(entity)
                if meta is not None and meta.label is not None:
                    graph.add((entity, RDFS.label, Literal(meta.label)))
                if entity in entity_types:
                    for type_uri in sorted(entity_types[entity]):
                        graph.add((entity, RDF.type, type_uri))

        canonical_pred_to_originals: Dict[URI, List[URI]] = {}
        for original, canonical in predicate_mapping.items():
            if str(canonical).startswith(doc_namespace):
                canonical_pred_to_originals.setdefault(canonical, []).append(original)

        for canonical, originals in canonical_pred_to_originals.items():
            merged_info = self._merge_predicate_info(
                [predicate_info.get(o) for o in originals]
            )
            if merged_info.label:
                graph.add((canonical, RDFS.label, Literal(merged_info.label)))
            if merged_info.comment:
                graph.add((canonical, RDFS.comment, Literal(merged_info.comment)))
            if merged_info.domain:
                graph.add((canonical, RDFS.domain, merged_info.domain))
            if merged_info.range:
                graph.add((canonical, RDFS.range, merged_info.range))
            if merged_info.is_explicit_property:
                graph.add((canonical, RDF.type, RDF.Property))

        processed_predicates = set(predicate_mapping.keys())
        for predicate, info in predicate_info.items():
            if str(predicate).startswith(doc_namespace) and predicate not in processed_predicates:
                if info.label:
                    graph.add((predicate, RDFS.label, Literal(info.label)))
                if info.comment:
                    graph.add((predicate, RDFS.comment, Literal(info.comment)))
                if info.domain:
                    graph.add((predicate, RDFS.domain, info.domain))
                if info.range:
                    graph.add((predicate, RDFS.range, info.range))
                if info.is_explicit_property:
                    graph.add((predicate, RDF.type, RDF.Property))

    @staticmethod
    def _get_best_label(label_dicts: List[Optional[EntityMetadata]]) -> Optional[str]:
        labels = [d.label for d in label_dicts if d is not None and d.label is not None]
        if not labels:
            return None
        return max(labels, key=len)

    @staticmethod
    def _merge_predicate_info(info_dicts: List[Optional[PredicateMetadata]]) -> PredicateMetadata:
        merged = PredicateMetadata(local_name="", is_explicit_property=False)
        for info in info_dicts:
            if info is None:
                continue
            for key in ("label", "comment", "domain", "range"):
                current_value = getattr(merged, key)
                new_value = getattr(info, key)
                if current_value is None and new_value is not None:
                    setattr(merged, key, new_value)
                elif (
                    current_value is not None
                    and new_value is not None
                    and isinstance(new_value, str)
                    and len(new_value) > len(str(current_value))
                ):
                    setattr(merged, key, new_value)
            if info.is_explicit_property:
                merged.is_explicit_property = True
        return merged
