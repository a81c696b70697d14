"""Media-group remainder: MediaExtractor, CommonsResourceExtractor,
CommonsKMLExtractor, ImageAnnotationExtractor — pure Catalyst expressions
over the parse columns (no Python stage, no shuffle; plan mirrors the other
extractors).

Reference parity notes (under /root/reference/core/.../mappings/):

- ``media_quads`` (MediaExtractor.scala:30-120): media file names mentioned
  in TEMPLATE PARAMETER VALUES (``| image = Foo.jpg`` without brackets) →
  image/sound typing + dbo:mediaItem to the commons-DBpedia resource. The
  reference additionally calls the live wiki API (``fileExistsOnWiki``) per
  file — an offline batch engine cannot, so every syntactically valid name
  is emitted (documented divergence). The first-image dbo:thumbnail stays
  with the link-based ImageExtractor.
- ``commons_resource_quads`` (CommonsResourceExtractor.scala:40-58):
  ``{{Commons}}`` / ``{{Commons|Name}}`` on a Main page → owl:sameAs to the
  commons-DBpedia resource (page title when the template has no argument).
- ``commons_kml_quads`` (CommonsKMLExtractor.scala:40-75): File pages named
  ``…/overlay.kml`` → ``<source lang="xml">…</source>`` bodies as
  rdf:XMLLiteral dbo:hasKMLData quads on the overlay-stripped subject.
  (Path-derived titles cannot carry '/', so the suffix match also accepts
  the space/underscore form.)
- ``image_annotation_quads`` (ImageAnnotationExtractor.scala:37-140):
  ``{{ImageNote}}…{{ImageNoteEnd}}`` pairs on File pages → a W3C Media
  Fragments region IRI (#xywh=pixel:x,y,w,h, ?width=&height= when
  dimx/dimy present) + dbo:description (plain) and dbo:asWikiText (raw) of
  the LINES between the two templates. Pages with unpaired templates are
  skipped (the reference throws; a batch engine drops and moves on).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from . import vocab as V
from .namespaces import FILE, MAIN, RDF_LANGSTRING, RDF_TYPE, XSD_STRING
from .wikidata import wiki_encode_expr

MEDIA_ITEMS = "images"          # MediaExtractor routes into the Images dataset
SOUNDS = "sounds"
COMMONS_LINK = "commons_link"
KML_FILES = "kml_files"
IMAGE_ANNOTATIONS = "image_annotations"

DBO = "http://dbpedia.org/ontology/"
DBO_MEDIA_ITEM = DBO + "mediaItem"
DBO_SOUND = V.DBO_SOUND  # single source of truth in vocab.py
DBO_HAS_KML_DATA = DBO + "hasKMLData"
DBO_HAS_ANNOTATION = DBO + "hasAnnotation"
DBO_DESCRIPTION = DBO + "description"
DBO_AS_WIKI_TEXT = DBO + "asWikiText"
RDF_XML_LITERAL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#XMLLiteral"
COMMONS_RESOURCE = "http://commons.dbpedia.org/resource/"
COMMONS_FILE_PATH = "http://commons.wikimedia.org/wiki/Special:FilePath/"

# MediaExtractorConfig.MediaRegex / ImageRegex / SoundRegex (pared to the
# common public extension set; VideoRegex files get only the mediaItem quad,
# matching the reference's "do nothing for videos" branch)
_IMAGE_EXTS = "jpg|jpeg|png|gif|svg|tif|tiff|webp|bmp"
_SOUND_EXTS = "ogg|oga|mp3|wav|flac|mid|midi"
_VIDEO_EXTS = "ogv|webm|mp4"
_MEDIA_NAME_RE = (
    r"(?i)\b([\w][\w ,.'()-]*\.(?:" + _IMAGE_EXTS + "|" + _SOUND_EXTS + "|" + _VIDEO_EXTS + r"))\b"
)


def _quads(df: DataFrame, ds, s: Column, p, v: Column, dt=None) -> DataFrame:
    return df.select(
        F.col("lang").alias("language"),
        (F.lit(ds) if isinstance(ds, str) else ds).alias("dataset"),
        s.cast("string").alias("subject"),
        (F.lit(p) if isinstance(p, str) else p).cast("string").alias("predicate"),
        v.cast("string").alias("value"),
        F.lit(None).cast("string").alias("context"),
        (F.lit(dt) if (dt is None or isinstance(dt, str)) else dt).cast("string").alias("datatype"),
    ).filter(F.col("subject").isNotNull() & F.col("value").isNotNull())


def media_quads(parsed: DataFrame) -> DataFrame:
    """Main-ns pages → media mentioned in template parameter values."""
    params = parsed.filter(F.col("namespace") == MAIN).select(
        "lang", "subject", F.explode("templates").alias("t")
    ).select("lang", "subject", F.explode("t.params").alias("p"))
    # FIRST media name per parameter value — the reference does the same
    # (MediaExtractor.scala searchMedia: MediaRegex.findFirstIn per text node)
    name = F.regexp_extract(F.col("p.value"), _MEDIA_NAME_RE, 1)
    media = params.filter(name != "").select(
        "lang", "subject",
        wiki_encode_expr(name).alias("enc"),
        F.lower(F.regexp_extract(name, r"\.([A-Za-z0-9]+)$", 1)).alias("ext"),
    ).distinct()
    url = F.concat(F.lit(COMMONS_FILE_PATH), F.col("enc"))
    dbp = F.concat(F.lit(COMMONS_RESOURCE), F.lit("File:"), F.col("enc"))
    wiki_media = F.concat(F.lit("http://"), F.col("lang"),
                          F.lit(".wikipedia.org/wiki/File:"), F.col("enc"))
    images = media.filter(F.col("ext").rlike("^(" + _IMAGE_EXTS + ")$"))
    sounds = media.filter(F.col("ext").rlike("^(" + _SOUND_EXTS + ")$"))
    out = _quads(images, MEDIA_ITEMS, F.col("subject"), V.FOAF_DEPICTION, url)
    out = out.unionByName(_quads(images, MEDIA_ITEMS, url, RDF_TYPE, F.lit(V.DBO_IMAGE)))
    out = out.unionByName(_quads(images, MEDIA_ITEMS, url, V.DC_RIGHTS, wiki_media))
    out = out.unionByName(_quads(sounds, SOUNDS, url, RDF_TYPE, F.lit(DBO_SOUND)))
    out = out.unionByName(_quads(media, MEDIA_ITEMS, F.col("subject"), DBO_MEDIA_ITEM, dbp))
    return out


def commons_resource_quads(parsed: DataFrame) -> DataFrame:
    """{{Commons}} / {{Commons|Name}} → owl:sameAs commons resource."""
    pages = parsed.filter(F.col("namespace") == MAIN).select(
        "lang", "subject", "title",
        F.explode(F.filter(F.col("templates"), lambda t: F.lower(t["name"]) == "commons")).alias("t"),
    )
    first_arg = F.try_element_at(
        F.filter(F.col("t.params"), lambda p: ~p["explicit"] | (p["key"] == "1")),
        F.lit(1),
    )["value"]
    target = F.coalesce(
        F.when(F.trim(first_arg) != "", F.trim(first_arg)), F.col("title")
    )
    value = F.concat(F.lit(COMMONS_RESOURCE), wiki_encode_expr(target))
    return _quads(pages, COMMONS_LINK, F.col("subject"), V.OWL_SAME_AS, value).dropDuplicates(
        ["subject", "value"]
    )


def dbpedia_resource_quads(parsed: DataFrame) -> DataFrame:
    """DBpediaResourceExtractor (mappings/DBpediaResourceExtractor.scala:
    47-72): a Main-ns (commons) page carrying a {{VN}} vernacular-names
    template links its resource to the en/de/fr DBpedia editions via
    owl:sameAs. Only the FIRST {{VN}} template counts (the reference
    returns from the template loop), only the de/en/fr params are routed,
    and a multi-name value ('A, B') keeps the first ', '-separated name."""
    vn = F.filter(F.col("templates"), lambda t: t["name"] == "VN")
    pages = parsed.filter((F.col("namespace") == MAIN) & (F.size(vn) > 0)).select(
        "lang", "subject", F.try_element_at(vn, F.lit(1))["params"].alias("params")
    )
    rows = pages.select(
        "lang", "subject",
        F.explode(
            F.filter(F.col("params"), lambda p: p["key"].isin("de", "en", "fr"))
        ).alias("p"),
    )
    name = F.trim(F.element_at(F.split(F.col("p.value"), ", "), 1))
    name = F.regexp_replace(name, r"^\[\[(?:[^\]|]*\|)?([^\]|]*)\]\]$", "$1")
    base = F.when(
        F.col("p.key") == "en", F.lit("http://dbpedia.org/resource/")
    ).otherwise(F.concat(F.lit("http://"), F.col("p.key"), F.lit(".dbpedia.org/resource/")))
    return _quads(
        rows.filter(name != ""), COMMONS_LINK, F.col("subject"), V.OWL_SAME_AS,
        F.concat(base, wiki_encode_expr(name)),
    )


_KML_SOURCE_RE = r"(?s)<source\s+lang=[\"']xml[\"']>\s*(.*?)\s*</source>"


def commons_kml_quads(parsed: DataFrame) -> DataFrame:
    """File pages named `…overlay.kml` → hasKMLData XMLLiteral quads."""
    pages = parsed.filter(
        (F.col("namespace") == FILE) & F.lower(F.col("title")).endswith("overlay.kml")
    ).select(
        "lang",
        F.regexp_replace(F.col("subject"), r"(?i)[/_ ]?overlay\.kml$", "").alias("s"),
        F.explode(F.regexp_extract_all(F.col("content"), F.lit(_KML_SOURCE_RE), 1)).alias("kml"),
    )
    return _quads(pages, KML_FILES, F.col("s"), DBO_HAS_KML_DATA, F.col("kml"),
                  RDF_XML_LITERAL)


def image_annotation_quads(parsed: DataFrame) -> DataFrame:
    """{{ImageNote}}…{{ImageNoteEnd}} pairs on File pages → region IRI +
    plain/wikitext description of the lines between the pair.

    Caveat: template line numbers come from the skip-stripped text, so a
    MULTI-LINE comment/ref before the pair shifts the body slice (the
    reference slices parsed nodes instead); single-line skips — the normal
    case on commons File pages — are unaffected."""
    notes = F.filter(F.col("templates"), lambda t: F.lower(t["name"]) == "imagenote")
    ends = F.filter(F.col("templates"), lambda t: F.lower(t["name"]) == "imagenoteend")
    pages = parsed.filter(
        (F.col("namespace") == FILE)
        & (F.size(notes) > 0)
        & (F.size(notes) == F.size(ends))  # unpaired → skip page (ref throws)
    ).select(
        "lang", "subject", "content",
        F.explode(F.arrays_zip(notes.alias("n"), ends.alias("e"))).alias("z"),
    )

    def param(key):
        return F.try_element_at(
            F.filter(F.col("z.n.params"), lambda p: F.lower(p["key"]) == key), F.lit(1)
        )["value"]

    x, y, w, h = (param(k).cast("int") for k in ("x", "y", "w", "h"))
    dimx, dimy = param("dimx").cast("int"), param("dimy").cast("int")
    enc = F.regexp_extract(F.col("subject"), r"File:(.*)$", 1)
    base = F.concat(F.lit(COMMONS_FILE_PATH), enc)
    dims = F.when(
        dimx.isNotNull() & dimy.isNotNull(),
        F.concat(F.lit("?width="), dimx.cast("string"), F.lit("&height="), dimy.cast("string")),
    ).otherwise(F.lit(""))
    region = F.concat(
        base, dims, F.lit("#xywh=pixel:"),
        x.cast("string"), F.lit(","), y.cast("string"), F.lit(","),
        w.cast("string"), F.lit(","), h.cast("string"),
    )
    # x/y/w/h required (ref: RuntimeException when missing → we skip); an
    # end STRICTLY BEFORE its note (inverted pair) is unpaired markup like
    # any other count mismatch → skip (ADVICE r3). Equal lines stay: the
    # compact one-line '{{ImageNote|…}}…{{ImageNoteEnd}}' form is legal and
    # indistinguishable from a same-line inversion by line number alone.
    ann = pages.filter(
        x.isNotNull() & y.isNotNull() & w.isNotNull() & h.isNotNull()
        & (F.col("z.e.line") >= F.col("z.n.line"))
    ).select(
        "lang", "subject", "content", region.alias("region"),
        F.col("z.n.line").alias("l0"), F.col("z.e.line").alias("l1"),
    )
    lines = F.split(F.col("content"), "\n")
    # template `line` is 1-based; the annotation body is the lines strictly
    # between the pair
    between = F.array_join(
        F.slice(lines, F.col("l0") + 1, F.greatest(F.col("l1") - F.col("l0") - 1, F.lit(0))),
        "\n",
    )
    plain = F.trim(F.regexp_replace(
        F.regexp_replace(between, r"\[\[(?:[^\]|]*\|)?([^\]|]*)\]\]", "$1"),
        r"'{2,}|</?[A-Za-z][^>]*>", "",
    ))
    ann = ann.withColumn("wikitext", F.trim(between)).withColumn("plain", plain)
    out = _quads(ann, IMAGE_ANNOTATIONS, F.col("subject"), DBO_HAS_ANNOTATION, F.col("region"))
    out = out.unionByName(
        _quads(ann.filter(F.col("plain") != ""), IMAGE_ANNOTATIONS, F.col("region"),
               DBO_DESCRIPTION, F.col("plain"), RDF_LANGSTRING)
    )
    out = out.unionByName(
        _quads(ann.filter(F.col("wikitext") != ""), IMAGE_ANNOTATIONS, F.col("region"),
               DBO_AS_WIKI_TEXT, F.col("wikitext"), XSD_STRING)
    )
    return out


# ---------------------------------------------------------------------------
# ImageExtractorNew full variant (mappings/ImageExtractorNew.scala:54-128,
# config/mappings/ImageExtractorConfig.scala:13-47)
# ---------------------------------------------------------------------------

IMAGE_META = "image_meta"

# Per-language non-free-license template regexes
# (ImageExtractorConfig.NonFreeRegex — template names from the public
# https://meta.wikimedia.org/wiki/Non-free_content policy pages). A File
# page whose wikitext matches its language's pattern is excluded from
# image_meta entirely (the reference's nonFreeImages side input).
NONFREE_TEMPLATE_RE: dict[str, str] = {
    "en": r"(?i)\{\{\s?non-free",
    "bg": r"(?i)\{\{\s?non-free",
    "hi": r"(?i)\{\{\s?non-free",
    "de": (r"(?iu)\{\{\s?(Dateiüberprüfung/benachrichtigt_\(Kategorie\)|Geschützt|"
           r"Geschützt-Ungeklärt|Bild-LogoSH|Bild-PD-alt-100|Bild-PD-alt-1923|"
           r"Bild-WikimediaCopyright)\s?\}\}"),
    "es": (r"(?iu)\{\{\s?(CopyrightByWikimedia|Copyvio|Logo|Screenshot|PD-CAGov|"
           r"Fairuse|Noncommercial|Nonderivative|NZCrownCopyright|PolandGov|"
           r"PD-IndiaGov|ADRM2)\s?\}\}"),
    "fr": (r"(?iu)\{\{\s?(Copyright by Wikimedia|Copyvio|Logo|Screenshot|"
           r"Ordnance Survey Copyright|Fairuse|Noncommercial|PolandGov|"
           r"nonderivative|NZCrownCopyright|PD-IndiaGov|ADRM2|Marque déposée)\s?\}\}"),
    "ru": (r"(?iu)\{\{\s?(CopyrightByWikimedia|Fairuse|несвободный файл|"
           r"несвободная лицензия|запрещенная лицензия)\s?\}\}"),
    # completion tranche — the remaining 11 NonFreeRegex rows (18/18)
    "ar": r"(?i)\{\{\s?غير حر",
    "am": r"(?i)\{\{\s?(non-free|Logo|Screenshot|Noncommercial|ነፃ_ያልሆነ)",
    "el": (r"(?iu)\{\{\s?(εύλογη χρήση|σήμα|σήμα αθλητικού σωματείου|"
           r"αφίσα ταινίας|σκηνή από ταινία|γραφικά υπολογιστή|"
           r"εξώφυλλο άλμπουμ|εξώφυλλο βιβλίου|μη ελεύθερο έργο τέχνης|"
           r"σελίδα κόμικς|σελίδα εφημερίδας|εικόνα-βιντεοπαιχνίδι|"
           r"ιδιοκτησία Wikimedia)\s?\}\}"),
    "eu": (r"(?i)\{\{\s?(Cc-by-nc-sa-2.5|Wikimedia_logoa|Copyrightdun_logoa|"
           r"Lizentzia_gabea|Album_azala|Aldizkari_azala|Fair_use|"
           r"Bideo-zinta_azala|Dirua|DVD_azala|Egunkari_azala|"
           r"Film_pantaila_irudia|Film_posterra|HQFL_logotipoa|Ikonoa|Ikurra|"
           r"Irrati_logotipoa|Jatetxe_logotipoa|Joku_azala|"
           r"Joku_pantaila_irudia|Kirol_logotipoa|Komiki_azala|Liburu_azala|"
           r"Logotipoa|Mahai-joku_azala|Olinpiada_logotipoa|"
           r"Politika_posterra|Propaganda|Software_azala|"
           r"Software_pantaila_irudia|Zigilua|TB_pantaila_irudia|"
           r"Web_pantaila_irudia)\s?\}\}"),
    "gl": (r"(?iu)\{\{\s?(non-free|Copyright by Wikimedia|Copyvio|Logo|"
           r"Screenshot|PD-CAGov|Fairuse|Noncommercial|Nonderivative|"
           r"NZCrownCopyright|PolandGov|PD-IndiaGov|ADRM2)\s?\}\}"),
    "id": (r"(?i)\{\{\s?(non-free|Fairuse|Logo|LogoOlahraga|LogoTV|"
           r"FotoHistoris|GambarKarakter|Promophoto|Smithsonian|"
           r"TampilanFilm|TampilanVideo|TampilanSitus|TampilanPermainan|"
           r"GambarUang|GambarPerangko|SampulVideo|SampulPermainan|"
           r"SampulAlbum|SampulBuku|Poster|"
           r"GambarBerhakTayangBersyarat)\s?\}\}"),
    "it": (r"(?iu)\{\{\s?(Sconosciuto|Riservato|NonCommerciale|Unknown|"
           r"Noncommercial|Nonderivative|Copyrighted|Screenshot|"
           r"Ordinance Survey Copyright|Fairuse|Cc-nc|cc-by-nc|cc-by-nc-2.0|"
           r"cc-nc-sa|cc-by-nc-sa|Cc-by-nc-sa-1.0|cc-by-nc-sa-2.0|cc-nd-nc|"
           r"cc-by-nd-nc|cc-by-nd-nc-2.0|cc-nd|cc-by-nd|cc-by-nd-2.0|"
           r"TW-cc-by-nc-nd-2.0|TW-cc-by-nc-sa-2.0|Copyright by Wikimedia|"
           r"CopyrightbyWikimedia)\s?\}\}"),
    "ja": (r"(?iu)\{\{\s?(Copyright by Wikimedia|Copyvio|Logo|Screenshot|"
           r"PD-CAGov|Fair use|Noncommercial|PolandGov|Nonderivative|"
           r"NZCrownCopyright|PD-IndiaGov|ADRM2|"
           r"RomanianGovernmentCopyright|FrenchMinistryOfForeignAffairs|"
           r"IRFCA|Members of the Riksdag|Attribution-Ubisoft)\s?\}\}"),
    "nl": r"(?i)\{\{\s?(Copyright by Wikimedia)\s?\}\}",
    "pl": (r"(?iu)\{\{\s?(Copyright by Wikimedia|brak licencji|brak źródła|"
           r"brak autora|brak pozwolenia|SWMPL|Zgoda PWM)\s?\}\}"),
    "pt": (r"(?iu)\{\{\s?(Unknown|Noncommercial|Nonderivative|Copyrighted|"
           r"Screenshot|Ordnance Survey Copyright|Fairuse|Cc-nc|cc-by-nc|"
           r"cc-by-nc-2.0|cc-nc-sa|cc-by-nc-sa|Cc-by-nc-sa-1.0|"
           r"cc-by-nc-sa-2.0|cc-nd-nc|cc-by-nd-nc|cc-by-nd-nc-2.0|cc-nd|"
           r"cc-by-nd|cc-by-nd-2.0|TW-cc-by-nc-nd-2.0|TW-cc-by-nc-sa-2.0|"
           r"Copyright by Wikimedia|CopyrightbyWikimedia)\s?\}\}"),
}

# Special-image filename classifiers (ImageExtractorConfig.scala:38-42; the
# stray leading "s?" before "^" in the originals can never match and is
# dropped). DIVERGENCE (documented): the reference binds all four kinds to
# foaf:depiction via TODO stubs (ImageExtractorNew.scala:46-50), which makes
# the classification unobservable; we emit the evidently-intended distinct
# dbo properties instead.
SPECIAL_IMAGE_RES: tuple[tuple[str, str], ...] = (
    ("flag", r"(?iu)^(?:[^a-zA-Z0-9]*|[\w\s]*[^a-zA-Z0-9]+)(?:flag|banner|pavillon|drapeau|bandera|pabellón|bandiera|флаг)(?:[^\w]*|[_\s]+)"),
    ("map", r"(?iu)^(?:[^a-zA-Z0-9]*|[\w\s]*[^a-zA-Z0-9]+)(?:map|karte|location|position|carte|carta|lage)(?:[^\w]*|[_\s]+)"),
    ("signature", r"(?iu)^(?:[^a-zA-Z0-9]*|[\w\s]*[^a-zA-Z0-9]+)(?:signature|unterschrift)"),
    ("coatOfArms", r"(?iu)^(?:[^a-zA-Z0-9]*|[\w\s]*[^a-zA-Z0-9]+)(?:coat_of_arms|emblem|crest|wappen|grandes_armes|blason|armoiries)(?:[^\w]*|[_\s]+)"),
)

# ImageExtractorConfig.ImageRegex restricted to one line (the reference's
# character class admits newlines — matches spanning lines are clearly
# unintended, documented divergence)
_IMAGE_NAME_RE = r"(?i)([^\"/\*?<>|:\n]+\.(?:jpe?g|png|gif|svg))"


def nonfree_images(parsed: DataFrame) -> DataFrame:
    """(lang, enc) of File-namespace pages declaring a non-free license
    template — the distributed twin of the reference's driver-side
    ``context.nonFreeImages`` list (built once per language by scanning File
    pages; here a map-only scan + broadcast-sized output)."""
    files = parsed.filter(F.col("namespace") == FILE).select("lang", "title", "content")
    flag = F.lit(False)
    for lg, pat in NONFREE_TEMPLATE_RE.items():
        flag = F.when(F.col("lang") == lg, F.col("content").rlike(pat)).otherwise(flag)
    return files.filter(flag).select("lang", wiki_encode_expr(F.col("title")).alias("enc"))


def image_meta_quads(parsed: DataFrame, nonfree: DataFrame | None = None) -> DataFrame:
    """ImageExtractorNew (mappings/ImageExtractorNew.scala:54-128): image
    file names from template parameter VALUES and File links on Main pages
    (the reference walks text/link nodes of the parse tree — bare infobox
    names like ``| logo = X.png`` count, which the link-based core misses),
    minus non-free files, → foaf:depiction + per-image thumbnail/type/rights
    quads, dbo:thumbnail for the FIRST free image, and special-image
    classification (flag/map/signature/coatOfArms) by filename keyword.

    Scale shape: candidate harvest is map-only; the non-free gate is a
    broadcast anti-join (the non-free list is license-violation sized, not
    corpus sized); first-image selection is a window partitioned by subject
    (no global sort)."""
    from pyspark.sql import Window

    main = parsed.filter(F.col("namespace") == MAIN)
    # document order = (line of the construct, param position within it) —
    # the reference walks the parse tree in document order
    tpl_files = (
        main.select("lang", "subject", F.explode("templates").alias("t"))
        .select("lang", "subject", F.col("t.line").alias("line"), F.posexplode("t.params"))
        .select("lang", "subject", "line", F.col("pos").alias("idx"),
                F.regexp_extract(F.col("col.value"), _IMAGE_NAME_RE, 1).alias("name"))
        .filter(F.col("name") != "")
    )
    file_links = (
        main.select(
            "lang", "subject",
            F.explode(F.filter(F.col("links"), lambda l: (l["iw"] == "") & (l["ns"] == FILE))).alias("l"),
        )
        .select("lang", "subject", F.col("l.line").alias("line"), F.lit(0).alias("idx"),
                F.col("l.target").alias("name"))
        .filter(F.col("name").rlike(r"(?i)\.(?:jpe?g|png|gif|svg)$"))
    )
    cand = tpl_files.unionByName(file_links).select(
        "lang", "subject", F.struct("line", "idx").alias("o"),
        wiki_encode_expr(F.col("name")).alias("enc"),
    )
    # one row per (page, file), earliest mention wins (duplicateMap semantics)
    cand = cand.groupBy("lang", "subject", "enc").agg(F.min("o").alias("o"))
    if nonfree is None:
        nonfree = nonfree_images(parsed)
    free = cand.join(F.broadcast(nonfree), ["lang", "enc"], "left_anti")

    url = F.concat(F.lit(COMMONS_FILE_PATH), F.col("enc"))
    thumb = F.concat(url, F.lit("?width=300"))
    wiki_page = F.concat(F.lit("http://"), F.col("lang"),
                         F.lit(".wikipedia.org/wiki/File:"), F.col("enc"))
    w = Window.partitionBy("lang", "subject").orderBy("o", "enc")
    free = free.withColumn("rk", F.row_number().over(w))

    out = _quads(free, IMAGE_META, F.col("subject"), V.FOAF_DEPICTION, url)
    out = out.unionByName(
        _quads(free.filter(F.col("rk") == 1), IMAGE_META, F.col("subject"), V.DBO_THUMBNAIL, thumb)
    )
    out = out.unionByName(_quads(free, IMAGE_META, url, V.FOAF_THUMBNAIL, thumb))
    out = out.unionByName(_quads(free, IMAGE_META, url, RDF_TYPE, F.lit(V.DBO_IMAGE)))
    out = out.unionByName(_quads(free, IMAGE_META, thumb, RDF_TYPE, F.lit(V.DBO_IMAGE)))
    out = out.unionByName(_quads(free, IMAGE_META, url, V.DC_RIGHTS, wiki_page))
    out = out.unionByName(_quads(free, IMAGE_META, thumb, V.DC_RIGHTS, wiki_page))
    for kind, pat in SPECIAL_IMAGE_RES:
        out = out.unionByName(
            _quads(free.filter(F.col("enc").rlike(pat)), IMAGE_META,
                   F.col("subject"), V.DBO + kind, url)
        )
    return out
