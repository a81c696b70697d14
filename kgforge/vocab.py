"""Dataset registry + predicate vocabulary.

Mirrors the reference's central dataset registry
(``config/provenance/DBpediaDatasets.scala:136-287``) and the ontology
property IRIs the extractor suite emits. The ``dataset`` string becomes the
partition column of the output graph table (DatasetDestination analog,
``destinations/DatasetDestination.scala``)."""

from __future__ import annotations

from .namespaces import (
    DBO,
    DC,
    DCT,
    FOAF,
    GEO,
    GEORSS,
    PROV,
    RDF_TYPE,
    RDFS_LABEL,
    SKOS,
)

# dataset names (snake_case of DBpediaDatasets entries)
LABELS = "labels"
CATEGORY_LABELS = "category_labels"
PAGE_IDS = "page_ids"
REVISION_IDS = "revision_ids"
PAGE_LENGTH = "page_length"
OUT_DEGREE = "out_degree"
REDIRECTS = "redirects"
TRANSITIVE_REDIRECTS = "transitive_redirects"
PAGE_LINKS = "page_links"
EXTERNAL_LINKS = "external_links"
ARTICLE_CATEGORIES = "article_categories"
SKOS_CATEGORIES = "skos_categories"
ARTICLE_TEMPLATES = "article_templates"
ARTICLE_TEMPLATES_NESTED = "article_templates_nested"
TEMPLATE_PARAMETERS = "template_parameters"
INTERLANGUAGE_LINKS = "interlanguage_links"
ANCHOR_TEXT = "anchor_text"
WIKIPEDIA_LINKS = "wikipedia_links"
DISAMBIGUATIONS = "disambiguations"
HOMEPAGES = "homepages"
GEO_COORDINATES = "geo_coordinates"
INFOBOX_PROPERTIES = "infobox_properties"
INFOBOX_PROPERTIES_MAPPED = "infobox_properties_mapped"
INFOBOX_PROPERTY_DEFINITIONS = "infobox_property_definitions"
INSTANCE_TYPES = "instance_types"
INSTANCE_TYPES_TRANSITIVE = "instance_types_transitive"
MAPPINGBASED_LITERALS = "mappingbased_literals"
MAPPINGBASED_OBJECTS = "mappingbased_objects_uncleaned"
SPECIFIC_MAPPINGBASED = "specific_mappingbased_properties"
GEO_COORDINATES_MAPPED = "geo_coordinates_mappingbased"
PROVENANCE = "revision_uris"
GENDERS = "genders"
PERSONDATA = "persondata"
PND = "pnd"
TOPICAL_CONCEPTS = "topical_concepts"
CITATION_LINKS = "citation_links"
CITATION_DATA = "citation_data"
REVISION_META = "revision_meta"
INFOBOX_REFERENCES = "infobox_references"
INTERLANGUAGE_SAME_AS = "interlanguage_links_same_as"
IMAGES = "images"
ABSTRACTS = "short_abstracts"
LONG_ABSTRACTS = "long_abstracts"
FILE_TYPES = "file_types"
FRENCH_POPULATION = "french_population"
SURFACE_FORMS = "surface_forms"
ENTITY_LINKS = "entity_links"

# ontology / vocab predicates
WIKI_PAGE_ID = DBO + "wikiPageID"
WIKI_PAGE_REVISION_ID = DBO + "wikiPageRevisionID"
WIKI_PAGE_LENGTH = DBO + "wikiPageLength"
WIKI_PAGE_OUT_DEGREE = DBO + "wikiPageOutDegree"
WIKI_PAGE_REDIRECTS = DBO + "wikiPageRedirects"
WIKI_PAGE_WIKI_LINK = DBO + "wikiPageWikiLink"
WIKI_PAGE_EXTERNAL_LINK = DBO + "wikiPageExternalLink"
WIKI_PAGE_INTER_LANGUAGE_LINK = DBO + "wikiPageInterLanguageLink"
WIKI_PAGE_WIKI_LINK_TEXT = DBO + "wikiPageWikiLinkText"
WIKI_PAGE_DISAMBIGUATES = DBO + "wikiPageDisambiguates"
ABSTRACT_PROP = DBO + "abstract"
DCT_SUBJECT = DCT + "subject"
DC_LANGUAGE = DC + "language"
SKOS_CONCEPT = SKOS + "Concept"
SKOS_PREF_LABEL = SKOS + "prefLabel"
SKOS_BROADER = SKOS + "broader"
SKOS_RELATED = SKOS + "related"
FOAF_IS_PRIMARY_TOPIC_OF = FOAF + "isPrimaryTopicOf"
FOAF_PRIMARY_TOPIC = FOAF + "primaryTopic"
FOAF_DOCUMENT = FOAF + "Document"
FOAF_HOMEPAGE = FOAF + "homepage"
FOAF_DEPICTION = FOAF + "depiction"
FOAF_THUMBNAIL = FOAF + "thumbnail"
DBO_THUMBNAIL = DBO + "thumbnail"
DBO_IMAGE = DBO + "Image"
# FileTypeExtractor vocabulary (mappings/FileTypeExtractor.scala:40-80)
DBO_FILE = DBO + "File"
DBO_STILL_IMAGE = DBO + "StillImage"
DBO_SOUND = DBO + "Sound"
DBO_MOVING_IMAGE = DBO + "MovingImage"
DBO_DOCUMENT_CLASS = DBO + "Document"
DBO_FILE_EXTENSION = DBO + "fileExtension"
DBO_FILE_URL = DBO + "fileURL"
DCT_FORMAT = DCT + "format"
DC_RIGHTS = DC + "rights"
GEO_SPATIAL_THING = GEO + "SpatialThing"
GEO_LAT = GEO + "lat"
GEO_LONG = GEO + "long"
GEORSS_POINT = GEORSS + "point"
PROV_WAS_DERIVED_FROM = PROV + "wasDerivedFrom"
RDF_PROPERTY = "http://www.w3.org/1999/02/22-rdf-syntax-ns#Property"
OWL_SAME_AS = "http://www.w3.org/2002/07/owl#sameAs"

__all__ = [n for n in dir() if n.isupper()]

# re-export commonly paired names
TYPE = RDF_TYPE
LABEL = RDFS_LABEL


FOAF_GENDER = FOAF + "gender"
FOAF_NAME = FOAF + "name"
FOAF_SURNAME = FOAF + "surname"
FOAF_GIVEN_NAME = FOAF + "givenName"
FOAF_PERSON = FOAF + "Person"
DC_DESCRIPTION = DC + "description"
BIRTH_DATE = DBO + "birthDate"
BIRTH_PLACE = DBO + "birthPlace"
DEATH_DATE = DBO + "deathDate"
INDIVIDUALISED_PND = DBO + "individualisedPnd"
MAIN_ARTICLE_FOR_CATEGORY = DBO + "mainArticleForCategory"


# citation id → IRI prefixes, in precedence order
# (CitationExtractor.scala:39-46 map + :330-365 getCitationIRI precedence)
_CITATION_ID_PREFIXES = (
    ("doi", "http://doi.org/"),
    ("jstor", "https://www.jstor.org/stable/"),
    ("pmc", "https://www.ncbi.nlm.nih.gov/pmc/articles/PMC"),
    ("pmid", "https://www.ncbi.nlm.nih.gov/pubmed/"),
    ("arxiv", "http://arxiv.org/abs/"),
    ("isbn", "http://books.google.com/books?vid=ISBN"),
    ("issn", "https://www.worldcat.org/ISSN/"),
    ("oclc", "https://www.worldcat.org/oclc/"),
)


def citation_iri(params) -> str:
    """Citation node IRI (CitationExtractor.scala:330-365): first usable
    standard identifier (doi → jstor → pmc → pmid → arxiv → isbn → issn →
    oclc), then the url/website, else the hash IRI (:439). Candidates that
    would contain a space are skipped (issue #594 guard, :164)."""
    import hashlib

    by_key: dict[str, str] = {}
    for k, v in params:
        by_key.setdefault((k or "").strip().lower(), (v or "").strip())
    for key, prefix in _CITATION_ID_PREFIXES:
        v = by_key.get(key, "")
        if v:
            iri = prefix + v
            if " " not in iri:
                return iri
    for key in ("url", "website"):
        v = by_key.get(key, "")
        if v and "://" in v and " " not in v:
            return v
    blob = "|".join(f"{k}={v}" for k, v in params)
    return "http://citation.dbpedia.org/hash/" + hashlib.sha256(blob.encode()).hexdigest()


def fmt_double(v: float) -> str:
    """Canonical double rendering used by BOTH the engine and the golden
    oracle (spec: Python shortest-repr; the reference uses Scala
    Double.toString — we pin one deterministic format and test against it)."""
    return repr(float(v))


def fmt_int(v: int) -> str:
    return str(int(v))
