"""Romanian Snowball suffix tables (published algorithm data,
https://snowballstem.org/algorithms/romanian/)."""

STEP0_SUFFIXES = (
    'iilor', 'ului', 'elor', 'iile', 'ilor', 'atei', 'aţie', 'aţia',
    'aua', 'ele', 'iua', 'iei', 'ile', 'ul', 'ea', 'ii',
)

STEP1_SUFFIXES = (
    'abilitate', 'abilitati', 'abilităţi', 'ibilitate', 'abilităi',
    'ivitate', 'ivitati', 'ivităţi', 'icitate', 'icitati', 'icităţi',
    'icatori', 'ivităi', 'icităi', 'icator', 'aţiune', 'atoare',
    'ătoare', 'iţiune', 'itoare', 'iciva', 'icive', 'icivi', 'icivă',
    'icala', 'icale', 'icali', 'icală', 'ativa', 'ative', 'ativi',
    'ativă', 'atori', 'ători', 'itiva', 'itive', 'itivi', 'itivă',
    'itori', 'iciv', 'ical', 'ativ', 'ator', 'ător', 'itiv', 'itor',
)

STEP2_SUFFIXES = (
    'abila', 'abile', 'abili', 'abilă', 'ibila', 'ibile', 'ibili',
    'ibilă', 'atori', 'itate', 'itati', 'ităţi', 'abil', 'ibil', 'oasa',
    'oasă', 'oase', 'anta', 'ante', 'anti', 'antă', 'ator', 'ităi',
    'iune', 'iuni', 'isme', 'ista', 'iste', 'isti', 'istă', 'işti',
    'ata', 'ată', 'ati', 'ate', 'uta', 'ută', 'uti', 'ute', 'ita',
    'ită', 'iti', 'ite', 'ica', 'ice', 'ici', 'ică', 'osi', 'oşi',
    'ant', 'iva', 'ive', 'ivi', 'ivă', 'ism', 'ist', 'at', 'ut', 'it',
    'ic', 'os', 'iv',
)

STEP3_SUFFIXES = (
    'seserăţi', 'aserăţi', 'iserăţi', 'âserăţi', 'userăţi', 'seserăm',
    'aserăm', 'iserăm', 'âserăm', 'userăm', 'serăţi', 'seseşi',
    'seseră', 'ească', 'arăţi', 'urăţi', 'irăţi', 'ârăţi', 'aseşi',
    'aseră', 'iseşi', 'iseră', 'âseşi', 'âseră', 'useşi', 'useră',
    'serăm', 'sesem', 'indu', 'ându', 'ează', 'eşti', 'eşte', 'ăşti',
    'ăşte', 'eaţi', 'iaţi', 'arăm', 'urăm', 'irăm', 'ârăm', 'asem',
    'isem', 'âsem', 'usem', 'seşi', 'seră', 'sese', 'are', 'ere', 'ire',
    'âre', 'ind', 'ând', 'eze', 'ezi', 'esc', 'ăsc', 'eam', 'eai',
    'eau', 'iam', 'iai', 'iau', 'aşi', 'ară', 'uşi', 'ură', 'işi',
    'iră', 'âşi', 'âră', 'ase', 'ise', 'âse', 'use', 'aţi', 'eţi',
    'iţi', 'âţi', 'sei', 'ez', 'am', 'ai', 'au', 'ea', 'ia', 'ui', 'âi',
    'ăm', 'em', 'im', 'âm', 'se',
)
