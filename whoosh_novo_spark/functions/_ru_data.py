"""Russian Snowball suffix tables + transliteration map.

Data from the published Snowball Russian algorithm
(https://snowballstem.org/algorithms/russian/), in the Roman
transliteration the oracle port uses (i^a/i^u/e` digraphs).
Generated from the public algorithm data; used by
functions/snowball.py stem_ru."""

PERFECTIVE_GERUND_SUFFIXES = (
    "ivshis'", "yvshis'", "vshis'", 'ivshi', 'yvshi', 'vshi', 'iv',
    'yv', 'v',
)

ADJECTIVAL_SUFFIXES = (
    'ui^ushchi^ui^u', 'ui^ushchi^ai^a', 'ui^ushchimi', 'ui^ushchymi',
    'ui^ushchego', 'ui^ushchogo', 'ui^ushchemu', 'ui^ushchomu',
    'ui^ushchikh', 'ui^ushchykh', 'ui^ushchui^u', 'ui^ushchaia',
    'ui^ushchoi^u', 'ui^ushchei^u', 'i^ushchi^ui^u', 'i^ushchi^ai^a',
    'ui^ushchee', 'ui^ushchie', 'ui^ushchye', 'ui^ushchoe',
    'ui^ushchei`', 'ui^ushchii`', 'ui^ushchyi`', 'ui^ushchoi`',
    'ui^ushchem', 'ui^ushchim', 'ui^ushchym', 'ui^ushchom',
    'i^ushchimi', 'i^ushchymi', 'i^ushchego', 'i^ushchogo',
    'i^ushchemu', 'i^ushchomu', 'i^ushchikh', 'i^ushchykh',
    'i^ushchui^u', 'i^ushchai^a', 'i^ushchoi^u', 'i^ushchei^u',
    'i^ushchee', 'i^ushchie', 'i^ushchye', 'i^ushchoe', 'i^ushchei`',
    'i^ushchii`', 'i^ushchyi`', 'i^ushchoi`', 'i^ushchem', 'i^ushchim',
    'i^ushchym', 'i^ushchom', 'shchi^ui^u', 'shchi^ai^a', 'ivshi^ui^u',
    'ivshi^ai^a', 'yvshi^ui^u', 'yvshi^ai^a', 'shchimi', 'shchymi',
    'shchego', 'shchogo', 'shchemu', 'shchomu', 'shchikh', 'shchykh',
    'shchui^u', 'shchai^a', 'shchoi^u', 'shchei^u', 'ivshimi',
    'ivshymi', 'ivshego', 'ivshogo', 'ivshemu', 'ivshomu', 'ivshikh',
    'ivshykh', 'ivshui^u', 'ivshai^a', 'ivshoi^u', 'ivshei^u',
    'yvshimi', 'yvshymi', 'yvshego', 'yvshogo', 'yvshemu', 'yvshomu',
    'yvshikh', 'yvshykh', 'yvshui^u', 'yvshai^a', 'yvshoi^u',
    'yvshei^u', 'vshi^ui^u', 'vshi^ai^a', 'shchee', 'shchie', 'shchye',
    'shchoe', 'shchei`', 'shchii`', 'shchyi`', 'shchoi`', 'shchem',
    'shchim', 'shchym', 'shchom', 'ivshee', 'ivshie', 'ivshye',
    'ivshoe', 'ivshei`', 'ivshii`', 'ivshyi`', 'ivshoi`', 'ivshem',
    'ivshim', 'ivshym', 'ivshom', 'yvshee', 'yvshie', 'yvshye',
    'yvshoe', 'yvshei`', 'yvshii`', 'yvshyi`', 'yvshoi`', 'yvshem',
    'yvshim', 'yvshym', 'yvshom', 'vshimi', 'vshymi', 'vshego',
    'vshogo', 'vshemu', 'vshomu', 'vshikh', 'vshykh', 'vshui^u',
    'vshai^a', 'vshoi^u', 'vshei^u', 'emi^ui^u', 'emi^ai^a', 'nni^ui^u',
    'nni^ai^a', 'vshee', 'vshie', 'vshye', 'vshoe', 'vshei`', 'vshii`',
    'vshyi`', 'vshoi`', 'vshem', 'vshim', 'vshym', 'vshom', 'emimi',
    'emymi', 'emego', 'emogo', 'ememu', 'emomu', 'emikh', 'emykh',
    'emui^u', 'emai^a', 'emoi^u', 'emei^u', 'nnimi', 'nnymi', 'nnego',
    'nnogo', 'nnemu', 'nnomu', 'nnikh', 'nnykh', 'nnui^u', 'nnai^a',
    'nnoi^u', 'nnei^u', 'emee', 'emie', 'emye', 'emoe', 'emei`',
    'emii`', 'emyi`', 'emoi`', 'emem', 'emim', 'emym', 'emom', 'nnee',
    'nnie', 'nnye', 'nnoe', 'nnei`', 'nnii`', 'nnyi`', 'nnoi`', 'nnem',
    'nnim', 'nnym', 'nnom', 'i^ui^u', 'i^ai^a', 'imi', 'ymi', 'ego',
    'ogo', 'emu', 'omu', 'ikh', 'ykh', 'ui^u', 'ai^a', 'oi^u', 'ei^u',
    'ee', 'ie', 'ye', 'oe', 'ei`', 'ii`', 'yi`', 'oi`', 'em', 'im',
    'ym', 'om',
)

REFLEXIVE_SUFFIXES = (
    'si^a', "s'",
)

VERB_SUFFIXES = (
    "esh'", 'ei`te', 'ui`te', 'ui^ut', "ish'", 'ete', 'i`te', 'i^ut',
    'nno', 'ila', 'yla', 'ena', 'ite', 'ili', 'yli', 'ilo', 'ylo',
    'eno', 'i^at', 'uet', 'eny', "it'", "yt'", 'ui^u', 'la', 'na', 'li',
    'em', 'lo', 'no', 'et', 'ny', "t'", 'ei`', 'ui`', 'il', 'yl', 'im',
    'ym', 'en', 'it', 'yt', 'i^u', 'i`', 'l', 'n',
)

NOUN_SUFFIXES = (
    'ii^ami', 'ii^akh', 'i^ami', 'ii^am', 'i^akh', 'ami', 'iei`',
    'i^am', 'iem', 'akh', 'ii^u', "'i^u", 'ii^a', "'i^a", 'ev', 'ov',
    'ie', "'e", 'ei', 'ii', 'ei`', 'oi`', 'ii`', 'em', 'am', 'om',
    'i^u', 'i^a', 'a', 'e', 'i', 'i`', 'o', 'u', 'y', "'",
)

SUPERLATIVE_SUFFIXES = (
    'ei`she', 'ei`sh',
)

DERIVATIONAL_SUFFIXES = (
    "ost'", 'ost',
)

# ordered transliteration replace chains (application order
# matters: digraph targets must win over their prefixes)

CYR2ROM_ORDERED = (
    ('А', 'a'), ('а', 'a'), ('Б', 'b'), ('б', 'b'), ('В', 'v'), ('в',
    'v'), ('Г', 'g'), ('г', 'g'), ('Д', 'd'), ('д', 'd'), ('Е', 'e'),
    ('е', 'e'), ('Ё', 'e'), ('ё', 'e'), ('Ж', 'zh'), ('ж', 'zh'), ('З',
    'z'), ('з', 'z'), ('И', 'i'), ('и', 'i'), ('Й', 'i`'), ('й', 'i`'),
    ('К', 'k'), ('к', 'k'), ('Л', 'l'), ('л', 'l'), ('М', 'm'), ('м',
    'm'), ('Н', 'n'), ('н', 'n'), ('О', 'o'), ('о', 'o'), ('П', 'p'),
    ('п', 'p'), ('Р', 'r'), ('р', 'r'), ('С', 's'), ('с', 's'), ('Т',
    't'), ('т', 't'), ('У', 'u'), ('у', 'u'), ('Ф', 'f'), ('ф', 'f'),
    ('Х', 'kh'), ('х', 'kh'), ('Ц', 't^s'), ('ц', 't^s'), ('Ч', 'ch'),
    ('ч', 'ch'), ('Ш', 'sh'), ('ш', 'sh'), ('Щ', 'shch'), ('щ', 'shch'),
    ('Ъ', "''"), ('ъ', "''"), ('Ы', 'y'), ('ы', 'y'), ('Ь', "'"), ('ь',
    "'"), ('Э', 'e`'), ('э', 'e`'), ('Ю', 'i^u'), ('ю', 'i^u'), ('Я',
    'i^a'), ('я', 'i^a'),
)

ROM2CYR_ORDERED = (
    ('i^u', 'ю'), ('i^a', 'я'), ('shch', 'щ'), ('kh', 'х'), ('t^s',
    'ц'), ('ch', 'ч'), ('e`', 'э'), ('i`', 'й'), ('sh', 'ш'), ('k',
    'к'), ('e', 'е'), ('zh', 'ж'), ('a', 'а'), ('b', 'б'), ('v', 'в'),
    ('g', 'г'), ('d', 'д'), ('e', 'е'), ('z', 'з'), ('i', 'и'), ('l',
    'л'), ('m', 'м'), ('n', 'н'), ('o', 'о'), ('p', 'п'), ('r', 'р'),
    ('s', 'с'), ('t', 'т'), ('u', 'у'), ('f', 'ф'), ("''", 'ъ'), ('y',
    'ы'), ("'", 'ь'),
)

# adjectival PARTICIPLE group: removal gated on a preceding a/i^a
ADJECTIVAL_G1_SUFFIXES = (
    'i^ushchi^ui^u', 'i^ushchi^ai^a', 'i^ushchui^u', 'i^ushchai^a',
    'i^ushchoi^u', 'i^ushchei^u', 'i^ushchimi', 'i^ushchymi',
    'i^ushchego', 'i^ushchogo', 'i^ushchemu', 'i^ushchomu',
    'i^ushchikh', 'i^ushchykh', 'shchi^ui^u', 'shchi^ai^a', 'i^ushchee',
    'i^ushchie', 'i^ushchye', 'i^ushchoe', 'i^ushchei`', 'i^ushchii`',
    'i^ushchyi`', 'i^ushchoi`', 'i^ushchem', 'i^ushchim', 'i^ushchym',
    'i^ushchom', 'vshi^ui^u', 'vshi^ai^a', 'shchui^u', 'shchai^a',
    'shchoi^u', 'shchei^u', 'emi^ui^u', 'emi^ai^a', 'nni^ui^u',
    'nni^ai^a', 'shchimi', 'shchymi', 'shchego', 'shchogo', 'shchemu',
    'shchomu', 'shchikh', 'shchykh', 'vshui^u', 'vshai^a', 'vshoi^u',
    'vshei^u', 'shchee', 'shchie', 'shchye', 'shchoe', 'shchei`',
    'shchii`', 'shchyi`', 'shchoi`', 'shchem', 'shchim', 'shchym',
    'shchom', 'vshimi', 'vshymi', 'vshego', 'vshogo', 'vshemu',
    'vshomu', 'vshikh', 'vshykh', 'emui^u', 'emai^a', 'emoi^u',
    'emei^u', 'nnui^u', 'nnai^a', 'nnoi^u', 'nnei^u', 'vshee', 'vshie',
    'vshye', 'vshoe', 'vshei`', 'vshii`', 'vshyi`', 'vshoi`', 'vshem',
    'vshim', 'vshym', 'vshom', 'emimi', 'emymi', 'emego', 'emogo',
    'ememu', 'emomu', 'emikh', 'emykh', 'nnimi', 'nnymi', 'nnego',
    'nnogo', 'nnemu', 'nnomu', 'nnikh', 'nnykh', 'emee', 'emie', 'emye',
    'emoe', 'emei`', 'emii`', 'emyi`', 'emoi`', 'emem', 'emim', 'emym',
    'emom', 'nnee', 'nnie', 'nnye', 'nnoe', 'nnei`', 'nnii`', 'nnyi`',
    'nnoi`', 'nnem', 'nnim', 'nnym', 'nnom',
)
