"""Per-language stopword sets.

The reference ships ``dictionaries/stopwords-iso.json`` (58 languages; used
for its wordlist-merge jobs, reference ``merge_wordlists.ipynb`` cell 2).  We
carry our own compact lists of the highest-frequency function words per
language — these are common public knowledge (any frequency list of the
language) and small enough to broadcast into every actor.

Used for (a) the stopword_ratio quality signal (Gopher/C4-style rule) and
(b) disambiguating same-script languages in the ensemble detector.
"""

from __future__ import annotations

STOPWORDS: dict[str, frozenset[str]] = {
    k: frozenset(v.split())
    for k, v in {
        "en": "the of and a to in is you that it he was for on are as with his they i at be this"
              " have from or one had by word but not what all were we when your can said there use"
              " an each which she do how their if will up other about out many then them these so",
        "de": "der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als"
              " auch es an werden aus er hat dass sie nach wird bei einer um am sind noch wie einem"
              " über einen so zum war haben nur oder aber vor zur bis mehr durch man sein wurde",
        "fr": "de la le et les des en un du une que est pour qui dans a par plus pas au sur ne se"
              " ce il sont la aux avec son une ont cette mais ou où leur elle si deux comme nous"
              " être fait était tout vous je dont bien aussi sans peut tous ces dont même",
        "es": "de la que el en y a los se del las un por con no una su para es al lo como más o"
              " pero sus le ha me si sin sobre este ya entre cuando todo esta ser son dos también"
              " fue había era muy años hasta desde está mi porque qué sólo han yo hay vez",
        "it": "di e il la che a in un per è una sono con non le si da dei come lo ma al se questo"
              " più anche della nel ci degli sul essere ha su alla tra o io suo che hanno tutto",
        "pt": "de a o que e do da em um para é com não uma os no se na por mais as dos como mas"
              " foi ao ele das tem à seu sua ou ser quando muito há nos já está eu também só",
        "nl": "de en van het een is in dat op te zijn met voor niet aan er ook als bij maar om"
              " uit door over ze dit naar hij dan zou of wat mijn men dus je was ik heeft worden",
        "ms": "yang dan di ini itu dengan untuk tidak pada adalah dalam akan saya kamu dia mereka"
              " ke dari ada oleh juga telah atau boleh lebih kami kita anda bagi sudah hanya",
        "id": "yang dan di ini itu dengan untuk tidak pada adalah dalam akan saya kamu dia mereka"
              " ke dari ada oleh juga telah atau bisa lebih kami kita anda bagi sudah hanya tetapi",
        "tl": "ang ng sa na mga ay ako siya ito hindi para kung may ni ka po ba at kay niya mo"
              " ko ating natin kayo sila nang din naman lang dahil pero wala meron",
        "vi": "của và các có trong là cho không được người này với những một đã trên tại theo"
              " từ đến khi ông sẽ cũng như về sau nhiều ra thì nước năm bị hay vào còn",
        "sv": "och i att det som en på är av för med till den har de inte om ett men var sig"
              " så här från vi kan man när år alla sin kommer vad eller",
        "pl": "w i z na do nie się że jest to jak przez po co tak o ma być jego od za ale czy"
              " tym przy które który ich tego była było już tylko przed może nad bardzo",
        "tr": "bir ve bu da ne için ile olarak daha çok gibi ben sen o biz siz onlar ama var"
              " yok en kadar sonra her şey iki el iş gün olan değil mi ki diye",
        "ru": "и в не на я что он с как это по но они мы она так из у же вы за бы то все её его"
              " а о мне было только ещё меня даже или если уже когда вот быть был нет от до",
        "uk": "і в не на я що він з як це по але вони ми вона так із у же ви за б то все її"
              " його а о мені було тільки ще мене навіть або якщо вже коли ось бути був",
        "el": "και το να της την των που με από για στο είναι δεν τα ο η οι σε θα του αυτό"
              " μου αλλά ένα μια τον στη ως κατά πιο αν ότι",
    }.items()
}

LANGS_WITH_STOPWORDS: list[str] = sorted(STOPWORDS.keys())
