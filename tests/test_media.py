"""Media-group remainder (MediaExtractor, CommonsResource, CommonsKML,
ImageAnnotation — mappings/*.scala parity; offline divergences documented
in kgforge/media.py)."""

from pyspark.sql import functions as F

from kgforge.media import (
    commons_kml_quads,
    commons_resource_quads,
    image_annotation_quads,
    media_quads,
)
from kgforge.parse import prepare

DBO = "http://dbpedia.org/ontology/"
FP = "http://commons.wikimedia.org/wiki/Special:FilePath/"


def _parsed(spark, rows):
    return prepare(spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ))


def test_media_quads_from_template_params(spark):
    rows = [
        ("r", "a/Town.wiki", "c", "en",
         "'''Town''' x.\n\n{{Infobox place\n| image = Town view.jpg\n"
         "| anthem_audio = Town anthem.ogg\n| clip = Town clip.webm\n"
         "| population = 5000\n}}\n"),
    ]
    got = {(r.dataset, r.subject, r.predicate, r.value)
           for r in media_quads(_parsed(spark, rows)).collect()}
    town = "http://dbpedia.org/resource/Town"
    img = FP + "Town_view.jpg"
    snd = FP + "Town_anthem.ogg"
    assert ("images", town, "http://xmlns.com/foaf/0.1/depiction", img) in got
    assert ("images", img, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", DBO + "Image") in got
    assert ("sounds", snd, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", DBO + "Sound") in got
    # every media file (incl. video) gets a mediaItem quad to commons-dbpedia
    items = {v for d, s, p, v in got if p == DBO + "mediaItem"}
    assert items == {
        "http://commons.dbpedia.org/resource/File:Town_view.jpg",
        "http://commons.dbpedia.org/resource/File:Town_anthem.ogg",
        "http://commons.dbpedia.org/resource/File:Town_clip.webm",
    }
    # video gets NO type/depiction quads (reference: "do nothing for videos")
    assert not any("clip.webm" in v for d, s, p, v in got if p != DBO + "mediaItem")


def test_commons_resource_quads(spark):
    rows = [
        ("r", "a/Blue tit.wiki", "c", "en", "'''Blue tit'''.\n\n{{Commons|Cyanistes caeruleus}}\n"),
        ("r", "a/Robin.wiki", "c", "en", "'''Robin'''.\n\n{{Commons}}\n"),
        ("r", "a/Plain.wiki", "c", "en", "'''Plain''' page, no template.\n"),
    ]
    got = {(r.subject, r.value) for r in commons_resource_quads(_parsed(spark, rows)).collect()}
    assert got == {
        ("http://dbpedia.org/resource/Blue_tit",
         "http://commons.dbpedia.org/resource/Cyanistes_caeruleus"),
        ("http://dbpedia.org/resource/Robin",
         "http://commons.dbpedia.org/resource/Robin"),
    }


def test_commons_kml_quads(spark):
    kml = '<?xml version="1.0"?><kml><Placemark/></kml>'
    rows = [
        ("r", "f/File:Map overlay.kml.wiki", "c", "en",
         f"Overlay page.\n<source lang=\"xml\">\n{kml}\n</source>\n"),
        ("r", "f/File:Other.jpg.wiki", "c", "en", "not kml"),
    ]
    got = [(r.subject, r.value, r.datatype) for r in commons_kml_quads(_parsed(spark, rows)).collect()]
    assert got == [(
        "http://dbpedia.org/resource/File:Map",
        kml,
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#XMLLiteral",
    )]


def test_image_annotation_quads(spark):
    rows = [
        ("r", "f/File:Pic.jpg.wiki", "c", "en",
         "Intro.\n"
         "{{ImageNote|x=10|y=20|w=30|h=40|dimx=800|dimy=600}}\n"
         "A [[bird]] in '''frame'''.\n"
         "{{ImageNoteEnd}}\n"
         "{{ImageNote|x=1|y=2|w=3|h=4}}\n"
         "Second note.\n"
         "{{ImageNoteEnd}}\n"),
        # unpaired -> page skipped
        ("r", "f/File:Bad.jpg.wiki", "c", "en", "{{ImageNote|x=1|y=2|w=3|h=4}}\nno end\n"),
        # INVERTED pair (end before note, equal counts) -> skipped, no
        # empty-body region quad (ADVICE r3)
        ("r", "f/File:Inv.jpg.wiki", "c", "en",
         "{{ImageNoteEnd}}\nstray\n{{ImageNote|x=5|y=6|w=7|h=8}}\n"),
        # compact ONE-LINE pair is legal (equal line numbers) and kept
        ("r", "f/File:One.jpg.wiki", "c", "en",
         "{{ImageNote|x=9|y=9|w=9|h=9}}{{ImageNoteEnd}}\n"),
    ]
    rowsq = image_annotation_quads(_parsed(spark, rows)).collect()
    subj = "http://dbpedia.org/resource/File:Pic.jpg"
    regions = {r.value for r in rowsq if r.predicate == DBO + "hasAnnotation"}
    assert regions == {
        FP + "Pic.jpg?width=800&height=600#xywh=pixel:10,20,30,40",
        FP + "Pic.jpg#xywh=pixel:1,2,3,4",
        FP + "One.jpg#xywh=pixel:9,9,9,9",
    }
    descs = {(r.subject, r.value) for r in rowsq if r.predicate == DBO + "description"}
    assert (FP + "Pic.jpg?width=800&height=600#xywh=pixel:10,20,30,40",
            "A bird in frame.") in descs
    wiki = {r.value for r in rowsq if r.predicate == DBO + "asWikiText"}
    assert "A [[bird]] in '''frame'''." in wiki
    assert not any("Bad.jpg" in r.subject for r in rowsq)
    assert not any("Inv.jpg" in r.subject for r in rowsq)
    assert any("One.jpg" in r.value and "#xywh=pixel:9,9,9,9" in r.value
               for r in rowsq if r.predicate == DBO + "hasAnnotation")


def test_media_plans_jvm_only(spark):
    rows = [("r", "a/X.wiki", "c", "en", "'''X''' {{Commons|Y}} {{I|image=A.jpg}}")]
    parsed = _parsed(spark, rows).persist()
    parsed.count()
    for fn in (media_quads, commons_resource_quads, commons_kml_quads, image_annotation_quads):
        plan = fn(parsed)._jdf.queryExecution().executedPlan().toString()
        # no Python stage anywhere (the only shuffles are the dedups in
        # media_quads/commons_resource_quads)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dbpedia_resource_vn_same_as(spark):
    """DBpediaResourceExtractor (DBpediaResourceExtractor.scala:47-72):
    {{VN}} on a Main page -> en/de/fr sameAs; first template only, first
    ', '-separated name, other language params ignored."""
    from kgforge.media import dbpedia_resource_quads

    rows = [
        ("r", "a/Cyanistes caeruleus.wiki", "c", "en",
         "A bird.\n{{VN\n| de = Blaumeise\n| en = Eurasian blue tit, Blue Tit\n"
         "| fr = Mésange bleue\n| nl = Pimpelmees\n}}\n"
         "{{VN\n| en = Second template ignored\n}}\n"),
        ("r", "a/NoVN.wiki", "c", "en", "No template here.\n"),
    ]
    q = dbpedia_resource_quads(_parsed(spark, rows)).collect()
    got = {(r.subject, r.predicate, r.value) for r in q}
    subj = "http://dbpedia.org/resource/Cyanistes_caeruleus"
    SA = "http://www.w3.org/2002/07/owl#sameAs"
    # wiki_encode keeps unicode raw (IRI semantics)
    assert got == {
        (subj, SA, "http://dbpedia.org/resource/Eurasian_blue_tit"),
        (subj, SA, "http://de.dbpedia.org/resource/Blaumeise"),
        (subj, SA, "http://fr.dbpedia.org/resource/Mésange_bleue"),
    }


def test_nonfree_regex_all_languages(spark):
    """The COMPLETE NonFreeRegex table (ImageExtractorConfig.scala:13-36,
    18/18 languages): a File page declaring its language's non-free
    license template is excluded from image_meta."""
    from kgforge.media import NONFREE_TEMPLATE_RE, nonfree_images
    from kgforge.parse import prepare

    assert len(NONFREE_TEMPLATE_RE) == 18
    samples = {
        "ar": "{{غير حر}}",
        "am": "{{Logo}}",
        "el": "{{σήμα}}",
        "eu": "{{Logotipoa}}",
        "gl": "{{Fairuse}}",
        "id": "{{SampulAlbum}}",
        "it": "{{cc-by-nc-sa}}",
        "ja": "{{Fair use}}",
        "nl": "{{Copyright by Wikimedia}}",
        "pl": "{{brak licencji}}",
        "pt": "{{cc-by-nd}}",
        "en": "{{Non-free logo}}",
    }
    rows = [
        ("r", f"pages/File:Pic_{lg}.jpg.wiki", "c", lg, body + "\nA file.\n")
        for lg, body in samples.items()
    ] + [
        # free files in the same languages must NOT be flagged
        ("r", f"pages/File:Free_{lg}.jpg.wiki", "c", lg, "{{cc-by-sa}}\nFree.\n")
        for lg in samples
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    flagged = {(r.lang, r.enc) for r in nonfree_images(prepare(df)).collect()}
    assert {lg for lg, _ in flagged} == set(samples)
    assert all(enc.startswith("Pic_") for _, enc in flagged)  # no Free_ rows
